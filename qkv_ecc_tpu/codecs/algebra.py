"""Algebraic structures for the ECC codecs: generator/parity-check matrices,
syndrome lookup tables, and error-classification constants.

This is the TPU-native equivalent of the reference's codec configuration module
(reference: ecc_codecs/triton_kernels/config.py). All tables are plain NumPy
arrays built once at import; kernels bake them in as constants (Pallas closes
over them), and the jnp reference codecs consume them directly.

Codes:
    - Hamming(7,4) SEC           : 4 data bits -> 7-bit codeword
    - Hamming(8,4) SECDED        : Hamming(7,4) + overall parity bit
    - Golay(24,12) perfect code  : 12 data bits (three INT4 nibbles) -> 24 bits

Bit-layout conventions (identical to the reference so that results and error
statistics are directly comparable; see reference config.py:128-189):
    Hamming(7,4):  codeword bits [d0 d1 d2 d3 p0 p1 p2]  (data in the low nibble)
    Hamming(8,4):  bit 7 = overall parity of the 7-bit codeword
    Golay(24,12):  codeword = data(12 low bits) | parity << 12,
                   data = n0 | n1 << 4 | n2 << 8  (three INT4 nibbles)
"""

from __future__ import annotations

import numpy as np

# =============================================================================
# Storage dtypes / bit counts
# =============================================================================

CODEC_CODEWORD_BITS = {"hamming74": 7, "hamming84": 8, "golay": 24}
CODEC_DATA_BITS = {"hamming74": 4, "hamming84": 4, "golay": 12}


def get_codeword_bits(codec: str) -> int:
    try:
        return CODEC_CODEWORD_BITS[codec]
    except KeyError:
        raise ValueError(f"Unknown codec: {codec}")


def get_data_bits(codec: str) -> int:
    try:
        return CODEC_DATA_BITS[codec]
    except KeyError:
        raise ValueError(f"Unknown codec: {codec}")


def get_physical_dtype(codec: str):
    """Physical storage dtype of one codeword (reference config.py:41-70).

    The TPU build keeps the same one-codeword-per-element layout for the
    baseline cache (uint8 for <=8-bit codewords, int32 for Golay); bit-packed
    layouts are a property of the cache module, not of the codec itself.
    """
    import jax.numpy as jnp

    if codec in ("hamming74", "hamming84", "int4"):
        return jnp.uint8
    if codec == "golay":
        return jnp.int32
    if codec == "none" or codec == "fp16":
        return jnp.bfloat16
    raise ValueError(f"Unknown codec: {codec}")


# =============================================================================
# Error classification (SECDED)
# =============================================================================


class ErrorType:
    """Hamming(8,4) SECDED decode classification.

    (syndrome, overall parity) -> class:
        syndrome==0, parity ok   -> NO_ERROR
        syndrome!=0, parity bad  -> SINGLE_CORRECTED
        syndrome!=0, parity ok   -> DOUBLE_DETECTED  (data preserved, corrupt)
        syndrome==0, parity bad  -> PARITY_ONLY      (data valid)
    """

    NO_ERROR = 0
    SINGLE_CORRECTED = 1
    DOUBLE_DETECTED = 2
    PARITY_ONLY = 3


# Sentinel error_count for an uncorrectable Golay codeword (>3 bit errors).
GOLAY_UNCORRECTABLE_COUNT = 4

# =============================================================================
# Hamming(7,4) / Hamming(8,4)
# =============================================================================

# Systematic generator matrix G (4x7): codeword = data @ G (mod 2).
# Columns: [d0 d1 d2 d3 p0 p1 p2].
HAMMING74_G = np.array(
    [
        [1, 0, 0, 0, 1, 1, 0],
        [0, 1, 0, 0, 1, 0, 1],
        [0, 0, 1, 0, 0, 1, 1],
        [0, 0, 0, 1, 1, 1, 1],
    ],
    dtype=np.uint8,
)

# Parity-check matrix H (3x7): syndrome = H @ received (mod 2).
HAMMING74_H = np.array(
    [
        [1, 1, 0, 1, 1, 0, 0],
        [1, 0, 1, 1, 0, 1, 0],
        [0, 1, 1, 1, 0, 0, 1],
    ],
    dtype=np.uint8,
)

HAMMING84_G = HAMMING74_G
HAMMING84_H = HAMMING74_H

# 3-bit syndrome -> erroneous bit position (or -1 for "no error").
# Entry for syndrome s is the unique codeword bit whose H-column equals the
# binary expansion of s.
SYNDROME_LUT_HAMMING74 = np.array([-1, 4, 5, 0, 6, 1, 2, 3], dtype=np.int8)
SYNDROME_LUT_HAMMING84 = SYNDROME_LUT_HAMMING74

# =============================================================================
# Golay(24,12)
# =============================================================================

# The 12x12 matrix B of the extended binary Golay code, G = [I12 | B],
# H = [B^T | I12]. Constructed from the circulant of quadratic residues mod 11
# bordered by an (almost) all-ones row/column. B is symmetric and B @ B = I
# over GF(2) (both properties are verified by the test-suite).


def _build_golay_b_matrix() -> np.ndarray:
    # Quadratic residues mod 11: {1, 3, 4, 5, 9}.
    residues = {1, 3, 4, 5, 9}
    b = np.zeros((12, 12), dtype=np.uint8)
    for i in range(11):
        for j in range(11):
            # Back-circulant core: 1 exactly when (i + j) mod 11 is 0 or a
            # quadratic residue.  This orientation makes B symmetric and
            # matches the reference's table entry-for-entry
            # (reference config.py:329-347).
            d = (i + j) % 11
            b[i, j] = 1 if (d == 0 or d in residues) else 0
        b[i, 11] = 1
        b[11, i] = 1
    b[11, 11] = 0
    return b


GOLAY_B_MATRIX = _build_golay_b_matrix()

# Row i of B packed into the low 12 bits of an int (bit j = B[i, j]).
GOLAY_B_ROW_MASKS = np.array(
    [int(sum(int(GOLAY_B_MATRIX[i, j]) << j for j in range(12))) for i in range(12)],
    dtype=np.int32,
)


def _build_golay_h_row_masks() -> np.ndarray:
    """Row i of H = [B^T | I12] packed into 24 bits: syndrome bit i is the
    parity of popcount(received & mask_i)."""
    masks = np.zeros(12, dtype=np.int64)
    for i in range(12):
        m = 0
        for j in range(12):
            if GOLAY_B_MATRIX[j, i]:
                m |= 1 << j
        m |= 1 << (12 + i)
        masks[i] = m
    return masks.astype(np.int32)


GOLAY_H_ROW_MASKS = _build_golay_h_row_masks()


def _syndrome_of_pattern(pattern: int) -> int:
    s = 0
    for i in range(12):
        if bin(pattern & int(GOLAY_H_ROW_MASKS[i])).count("1") & 1:
            s |= 1 << i
    return s


def build_golay_syndrome_table() -> np.ndarray:
    """Map each 12-bit syndrome to its unique weight<=3 error pattern.

    Golay(24,12) is perfect: the 1 + 24 + C(24,2) + C(24,3) = 2325 patterns of
    weight <=3 have distinct syndromes; the remaining 4096-2325 = 1771
    syndromes are uncorrectable and stay -1 (reference config.py:403-457).
    """
    table = np.full(4096, -1, dtype=np.int64)
    table[0] = 0
    patterns = []
    for i in range(24):
        patterns.append(1 << i)
    for i in range(24):
        for j in range(i + 1, 24):
            patterns.append((1 << i) | (1 << j))
    for i in range(24):
        for j in range(i + 1, 24):
            for k in range(j + 1, 24):
                patterns.append((1 << i) | (1 << j) | (1 << k))
    for p in patterns:
        s = _syndrome_of_pattern(p)
        if table[s] == -1:
            table[s] = p
    return table.astype(np.int32)


# Built once at import (~40ms); reused by the jnp reference decoder and tests.
GOLAY_SYNDROME_TABLE = build_golay_syndrome_table()

# Generator matrix of the full 24-bit code, G = [I12 | B] (12 x 24), used by
# the algebraic verification suite.
GOLAY_G = np.concatenate([np.eye(12, dtype=np.uint8), GOLAY_B_MATRIX], axis=1)
# Parity check H = [B^T | I12] (12 x 24).
GOLAY_H = np.concatenate([GOLAY_B_MATRIX.T, np.eye(12, dtype=np.uint8)], axis=1)
