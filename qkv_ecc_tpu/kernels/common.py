"""Shared helpers for the Pallas TPU kernels.

All kernels run compiled on TPU and fall back to the Pallas interpreter on
CPU (so the same code paths are exercised by the CPU test mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def use_interpret() -> bool:
    """Interpret Pallas kernels when not running on a TPU backend."""
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


# -----------------------------------------------------------------------------
# Inline decode helpers shared between the elementwise codec kernels and the
# fused paged-attention kernel. These operate on int32 lanes (the VPU's native
# width) and are pure jnp so they can be called inside any Pallas kernel body.
# -----------------------------------------------------------------------------

# Hamming(7,4) syndrome -> bit position, encoded branchlessly.
# LUT: [-1, 4, 5, 0, 6, 1, 2, 3]
_H74_LUT_PACKED = (-1, 4, 5, 0, 6, 1, 2, 3)


def hamming7_syndrome_i32(cw7):
    c = [(cw7 >> i) & 1 for i in range(7)]
    s0 = c[0] ^ c[1] ^ c[3] ^ c[4]
    s1 = c[0] ^ c[2] ^ c[3] ^ c[5]
    s2 = c[1] ^ c[2] ^ c[3] ^ c[6]
    return s0 | (s1 << 1) | (s2 << 2)


def h74_error_mask_i32(syndrome):
    """Map syndrome -> XOR correction mask via a branchless select chain
    (the TPU analogue of the reference's constexpr-LUT nested-where switch,
    kv_cache/attention_ecc.py:126-138)."""
    mask = jnp.zeros_like(syndrome)
    for s_val, pos in enumerate(_H74_LUT_PACKED):
        if pos >= 0:
            mask = jnp.where(syndrome == s_val, 1 << pos, mask)
    return mask


def hamming74_decode_i32(cw):
    """int32 lanes of 7-bit codewords -> (data nibbles, error_detected)."""
    cw7 = cw & 0x7F
    syndrome = hamming7_syndrome_i32(cw7)
    corrected = cw7 ^ h74_error_mask_i32(syndrome)
    return corrected & 0xF, syndrome != 0


def hamming84_decode_i32(cw):
    """int32 lanes of 8-bit SECDED codewords -> (data, error_type)."""
    cw7 = cw & 0x7F
    stored_parity = (cw >> 7) & 1
    syndrome = hamming7_syndrome_i32(cw7)

    p = cw7 ^ (cw7 >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    actual_parity = p & 1

    parity_error = stored_parity != actual_parity
    syndrome_zero = syndrome == 0

    # ErrorType: 0 NO_ERROR, 1 SINGLE_CORRECTED, 2 DOUBLE_DETECTED, 3 PARITY_ONLY
    error_type = jnp.where(
        syndrome_zero,
        jnp.where(parity_error, 3, 0),
        jnp.where(parity_error, 1, 2),
    )
    correction = jnp.where(error_type == 1, h74_error_mask_i32(syndrome), 0)
    data = (cw7 ^ correction) & 0xF
    return data, error_type


def _h74_data_correction_i32(syndrome):
    """XOR mask for the DATA nibble only. Parity-bit errors (syndrome 1, 2,
    4 -> positions p0/p1/p2) never change the data, so only syndromes
    {3, 5, 6, 7} (data bits d0..d3) need a correction: 3->bit0, 5->bit1,
    6->bit2, 7->bit3, i.e. 1 << (syndrome - 4) except 3 -> 1."""
    return jnp.where(
        syndrome == 3,
        1,
        jnp.where(syndrome >= 5, 1 << jnp.maximum(syndrome - 4, 0), 0),
    )


def hamming74_correct_data_i32(cw):
    """Data-only Hamming(7,4) correction - the attention fast path (no
    error flags, parity-bit corrections skipped)."""
    cw7 = cw & 0x7F
    syndrome = hamming7_syndrome_i32(cw7)
    return (cw7 ^ _h74_data_correction_i32(syndrome)) & 0xF


def hamming84_correct_data_i32(cw):
    """Data-only SECDED correction - the attention fast path.

    Same semantics as hamming84_decode_i32's data output (single errors
    corrected, double errors PRESERVE the corrupt data bits) but ~1.5x
    fewer VPU ops: no error-type classification, overall parity via one
    hardware popcount, and corrections only computed for data-bit
    syndromes (parity-bit flips never change the nibble)."""
    cw7 = cw & 0x7F
    syndrome = hamming7_syndrome_i32(cw7)
    # odd overall parity over all 8 bits <=> stored parity != computed
    parity_odd = (jax.lax.population_count(cw & 0xFF) & 1) == 1
    single = (syndrome != 0) & parity_odd
    corr = jnp.where(single, _h74_data_correction_i32(syndrome), 0)
    return (cw7 ^ corr) & 0xF


def hamming74_encode_i32(d):
    d = d & 0xF
    b = [(d >> i) & 1 for i in range(4)]
    p0 = b[0] ^ b[1] ^ b[3]
    p1 = b[0] ^ b[2] ^ b[3]
    p2 = b[1] ^ b[2] ^ b[3]
    return d | (p0 << 4) | (p1 << 5) | (p2 << 6)


def hamming84_encode_i32(d):
    cw7 = hamming74_encode_i32(d)
    p = cw7 ^ (cw7 >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    return cw7 | ((p & 1) << 7)


def _parity(x):
    return jax.lax.population_count(x) & 1


def golay_encode_i32(data12, b_masks):
    """12-bit data words -> 24-bit codewords. b_masks: tuple of 12 ints."""
    parity = jnp.zeros_like(data12)
    for j in range(12):
        parity = parity | (_parity(data12 & b_masks[j]) << j)
    return data12 | (parity << 12)


def golay_decode_i32(cw, b_masks, *, zero_uncorrectable):
    """Arithmetic (LUT-free) Golay decode on int32 lanes.

    IMLD decoder - see qkv_ecc_tpu/codecs/reference.py:golay_decode_algebraic
    for the derivation; differential-tested against the syndrome-LUT oracle.

    Returns (data12, error_count) with error_count 0-3 or the sentinel 4.
    When zero_uncorrectable is True, uncorrectable codewords decode to 0
    (the fused-attention semantics, reference attention_ecc.py:257-259);
    otherwise their corrupt data bits are preserved.
    """
    pc = jax.lax.population_count
    d = cw & 0xFFF
    p = (cw >> 12) & 0xFFF

    s = jnp.zeros_like(cw)
    for i in range(12):
        s = s | (_parity(d & b_masks[i]) << i)
    s = s ^ p

    e1 = s << 12
    ok1 = pc(s) <= 3

    ok2 = jnp.zeros_like(cw, dtype=bool)
    e2 = jnp.zeros_like(cw)
    for i in range(12):
        cand = s ^ b_masks[i]
        hit = (pc(cand) <= 2) & ~ok2
        e2 = jnp.where(hit, (1 << i) | (cand << 12), e2)
        ok2 = ok2 | hit

    q = jnp.zeros_like(cw)
    for i in range(12):
        q = q | (_parity(s & b_masks[i]) << i)

    e3 = q
    ok3 = pc(q) <= 3

    ok4 = jnp.zeros_like(cw, dtype=bool)
    e4 = jnp.zeros_like(cw)
    for i in range(12):
        cand = q ^ b_masks[i]
        hit = (pc(cand) <= 2) & ~ok4
        e4 = jnp.where(hit, cand | (1 << (12 + i)), e4)
        ok4 = ok4 | hit

    e = jnp.where(ok1, e1, jnp.where(ok2, e2, jnp.where(ok3, e3, jnp.where(ok4, e4, 0))))
    correctable = ok1 | ok2 | ok3 | ok4

    corrected = cw ^ e
    data = corrected & 0xFFF
    if zero_uncorrectable:
        data = jnp.where(correctable, data, 0)
    else:
        data = jnp.where(correctable, data, cw & 0xFFF)
    error_count = jnp.where(correctable, pc(e), 4)
    return data, error_count


def golay_correct_data_i32(cw, b_masks):
    """Data-half-only arithmetic Golay correction - the attention fast path.

    Same IMLD stages as golay_decode_i32 but (a) tracks only the DATA half
    of the error pattern (stage 1 corrects parity bits only, so its data
    correction is zero), (b) skips error counting, and (c) accumulates
    within-stage hits with OR instead of first-hit select chains: B-matrix
    rows are pairwise >= 6 apart, so pc(s ^ B_i) <= 2 can hold for at most
    one i (if pc(s^B_i) <= 2 then pc(s^B_j) >= 6-2 > 2 for j != i).
    ~20% fewer VPU ops per codeword lane. Uncorrectable codewords decode
    to 0 (fused-attention semantics, reference attention_ecc.py:257-259).
    """
    pc = jax.lax.population_count
    d = cw & 0xFFF
    p = (cw >> 12) & 0xFFF

    s = jnp.zeros_like(cw)
    for i in range(12):
        s = s | (_parity(d & b_masks[i]) << i)
    s = s ^ p

    ok1 = pc(s) <= 3  # all errors in the parity half: data untouched

    ok2 = jnp.zeros_like(cw, dtype=bool)
    e2 = jnp.zeros_like(cw)
    for i in range(12):
        hit = pc(s ^ b_masks[i]) <= 2
        e2 = jnp.where(hit, 1 << i, e2)
        ok2 = ok2 | hit

    q = jnp.zeros_like(cw)
    for i in range(12):
        q = q | (_parity(s & b_masks[i]) << i)

    ok3 = pc(q) <= 3  # data error = q

    ok4 = jnp.zeros_like(cw, dtype=bool)
    e4 = jnp.zeros_like(cw)
    for i in range(12):
        cand = q ^ b_masks[i]
        hit = pc(cand) <= 2
        e4 = jnp.where(hit, cand, e4)
        ok4 = ok4 | hit

    ed = jnp.where(ok1, 0, jnp.where(ok2, e2, jnp.where(ok3, q, e4)))
    correctable = ok1 | ok2 | ok3 | ok4
    return jnp.where(correctable, d ^ ed, 0)
