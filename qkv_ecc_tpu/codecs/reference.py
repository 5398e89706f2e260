"""Vectorized jnp implementations of the ECC codecs.

These are the correctness oracles for the Pallas kernels *and* the production
prefill path: under `jit`, XLA fuses the whole
quantize -> encode -> inject -> decode -> dequantize chain into a handful of
elementwise VPU loops, so unlike the reference (which needed hand-written
Triton kernels to escape per-element Python loops, see
kv_cache/ecc_shim.py:626-737) there is no "slow python path" on TPU.

Semantics mirror the reference kernels exactly:
    - hamming74_*  : reference ecc_codecs/triton_kernels/hamming74_triton.py
    - hamming84_*  : reference ecc_codecs/triton_kernels/hamming84_triton.py
      (double errors PRESERVE data, classification truth table :185-187)
    - golay_*      : reference ecc_codecs/triton_kernels/golay_triton.py
      (uncorrectable codewords preserve data, error_count sentinel 4)

All functions are shape-polymorphic, jit-safe, and return error statistics as
arrays (callers accumulate them outside jit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .algebra import (
    ErrorType,
    GOLAY_B_ROW_MASKS,
    GOLAY_H_ROW_MASKS,
    GOLAY_SYNDROME_TABLE,
    GOLAY_UNCORRECTABLE_COUNT,
    SYNDROME_LUT_HAMMING74,
)

# jnp copies of the lookup tables (device constants after first trace).
_H74_LUT = jnp.asarray(SYNDROME_LUT_HAMMING74, dtype=jnp.int32)
_GOLAY_LUT = jnp.asarray(GOLAY_SYNDROME_TABLE, dtype=jnp.int32)
_GOLAY_H_MASKS = jnp.asarray(GOLAY_H_ROW_MASKS, dtype=jnp.int32)
_GOLAY_B_MASKS = jnp.asarray(GOLAY_B_ROW_MASKS, dtype=jnp.int32)


def _bit(x, i):
    return (x >> i) & 1


# =============================================================================
# Hamming(7,4)
# =============================================================================


@jax.jit
def hamming74_encode(values: jax.Array) -> jax.Array:
    """INT4 values (uint8, low nibble) -> 7-bit codewords (uint8).

    Layout [d0 d1 d2 d3 p0 p1 p2]: p0=d0^d1^d3, p1=d0^d2^d3, p2=d1^d2^d3.
    """
    d = values.astype(jnp.uint8) & 0xF
    d0, d1, d2, d3 = _bit(d, 0), _bit(d, 1), _bit(d, 2), _bit(d, 3)
    p0 = d0 ^ d1 ^ d3
    p1 = d0 ^ d2 ^ d3
    p2 = d1 ^ d2 ^ d3
    return (d | (p0 << 4) | (p1 << 5) | (p2 << 6)).astype(jnp.uint8)


def _hamming7_syndrome(cw7):
    c0, c1, c2, c3 = _bit(cw7, 0), _bit(cw7, 1), _bit(cw7, 2), _bit(cw7, 3)
    c4, c5, c6 = _bit(cw7, 4), _bit(cw7, 5), _bit(cw7, 6)
    s0 = c0 ^ c1 ^ c3 ^ c4
    s1 = c0 ^ c2 ^ c3 ^ c5
    s2 = c1 ^ c2 ^ c3 ^ c6
    return (s0 | (s1 << 1) | (s2 << 2)).astype(jnp.int32)


@jax.jit
def hamming74_decode(codewords: jax.Array):
    """Decode 7-bit codewords -> (data, error_detected, corrected_count).

    Single-error correction via the 8-entry syndrome LUT; a nonzero syndrome
    always triggers a correction (and counts as one corrected error).
    """
    cw = codewords.astype(jnp.uint8) & 0x7F
    syndrome = _hamming7_syndrome(cw)
    error_pos = _H74_LUT[syndrome]
    correction = jnp.where(
        error_pos >= 0, 1 << jnp.maximum(error_pos, 0).astype(jnp.uint32), 0
    ).astype(jnp.uint8)
    corrected = cw ^ correction
    data = (corrected & 0xF).astype(jnp.uint8)
    error_detected = syndrome != 0
    corrected_count = jnp.sum(error_detected, dtype=jnp.int32)
    return data, error_detected, corrected_count


# =============================================================================
# Hamming(8,4) SECDED
# =============================================================================


@jax.jit
def hamming84_encode(values: jax.Array) -> jax.Array:
    """INT4 values -> 8-bit SECDED codewords (bit 7 = overall parity)."""
    cw7 = hamming74_encode(values)
    p = cw7 ^ (cw7 >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    p = p & 1
    return (cw7 | (p << 7)).astype(jnp.uint8)


@jax.jit
def hamming84_decode(codewords: jax.Array):
    """Decode SECDED codewords.

    Returns (data, error_type, corrected_count, detected_count) where
    error_type follows `ErrorType` and double errors PRESERVE the (possibly
    corrupt) data bits rather than zeroing them.
    """
    cw = codewords.astype(jnp.uint8)
    cw7 = cw & 0x7F
    stored_parity = (cw >> 7) & 1

    syndrome = _hamming7_syndrome(cw7)

    actual_parity = cw7 ^ (cw7 >> 4)
    actual_parity = actual_parity ^ (actual_parity >> 2)
    actual_parity = actual_parity ^ (actual_parity >> 1)
    actual_parity = actual_parity & 1

    parity_error = stored_parity != actual_parity
    syndrome_zero = syndrome == 0

    error_type = jnp.where(
        syndrome_zero,
        jnp.where(parity_error, ErrorType.PARITY_ONLY, ErrorType.NO_ERROR),
        jnp.where(parity_error, ErrorType.SINGLE_CORRECTED, ErrorType.DOUBLE_DETECTED),
    ).astype(jnp.uint8)

    error_pos = _H74_LUT[syndrome]
    should_correct = (error_type == ErrorType.SINGLE_CORRECTED) & (error_pos >= 0)
    correction = jnp.where(
        should_correct, (1 << jnp.maximum(error_pos, 0).astype(jnp.uint32)), 0
    ).astype(jnp.uint8)
    corrected = cw7 ^ correction
    data = (corrected & 0xF).astype(jnp.uint8)

    corrected_count = jnp.sum(error_type == ErrorType.SINGLE_CORRECTED, dtype=jnp.int32)
    detected_count = jnp.sum(error_type == ErrorType.DOUBLE_DETECTED, dtype=jnp.int32)
    return data, error_type, corrected_count, detected_count


# =============================================================================
# Golay(24,12)
# =============================================================================


def _parity_popcount(x):
    """Parity (popcount mod 2) of an int32 array, elementwise."""
    return (jax.lax.population_count(x) & 1).astype(jnp.int32)


@jax.jit
def golay_syndrome(codewords: jax.Array) -> jax.Array:
    """12-bit syndrome of 24-bit codewords (int32)."""
    cw = codewords.astype(jnp.int32)
    s = jnp.zeros_like(cw)
    for i in range(12):
        s = s | (_parity_popcount(cw & _GOLAY_H_MASKS[i]) << i)
    return s


def golay_pack(nibbles: jax.Array) -> jax.Array:
    """Pack triplets of INT4 values [..., 3] into 12-bit data words [...]."""
    n = nibbles.astype(jnp.int32) & 0xF
    return n[..., 0] | (n[..., 1] << 4) | (n[..., 2] << 8)


def golay_unpack(data12: jax.Array) -> jax.Array:
    """Unpack 12-bit data words [...] into INT4 triplets [..., 3] (uint8)."""
    d = data12.astype(jnp.int32)
    return jnp.stack(
        [(d >> 0) & 0xF, (d >> 4) & 0xF, (d >> 8) & 0xF], axis=-1
    ).astype(jnp.uint8)


@jax.jit
def golay_encode(nibbles: jax.Array) -> jax.Array:
    """Encode INT4 triplets [..., 3] -> 24-bit codewords [...] (int32).

    parity bit j = XOR_i data_i * B[i][j]; codeword = data | parity << 12.
    Since B is symmetric, parity bit j is the popcount-parity of
    (data & B_row_j).
    """
    data = golay_pack(nibbles)
    parity = jnp.zeros_like(data)
    for j in range(12):
        parity = parity | (_parity_popcount(data & _GOLAY_B_MASKS[j]) << j)
    return data | (parity << 12)


@jax.jit
def golay_decode(codewords: jax.Array):
    """LUT-based Golay decode (the oracle; the Pallas kernel uses the
    algebraic decoder, differential-tested against this one).

    Returns (triplets [...,3] uint8, error_count [...], corrected_bits,
    uncorrectable_count). error_count is 0-3 for corrected codewords and the
    sentinel 4 for uncorrectable ones; uncorrectable codewords preserve their
    (corrupt) data bits (reference golay_triton.py:267-271).
    """
    cw = codewords.astype(jnp.int32)
    syndrome = golay_syndrome(cw)
    pattern = _GOLAY_LUT[syndrome]
    correctable = pattern >= 0
    corrected = jnp.where(correctable, cw ^ jnp.maximum(pattern, 0), cw)
    error_count = jnp.where(
        correctable,
        jax.lax.population_count(jnp.maximum(pattern, 0)),
        GOLAY_UNCORRECTABLE_COUNT,
    ).astype(jnp.int32)
    triplets = golay_unpack(corrected & 0xFFF)
    corrected_bits = jnp.sum(jnp.where(correctable, error_count, 0), dtype=jnp.int32)
    uncorrectable_count = jnp.sum(~correctable, dtype=jnp.int32)
    return triplets, error_count, corrected_bits, uncorrectable_count


@jax.jit
def golay_decode_algebraic(codewords: jax.Array):
    """LUT-free arithmetic Golay decode (IMLD / Lin-Costello style).

    This is the decoder shape used inside the fused Pallas attention kernel:
    no 4096-entry gather, only XOR/popcount/select chains that map directly
    onto the TPU VPU. For every error pattern of weight <= 3 it returns the
    same result as `golay_decode` (exhaustively tested).

    With r = (d, p) and s = B d ^ p:
        1. wt(s) <= 3                  -> e = (0, s)
        2. exists i: wt(s ^ B_i) <= 2  -> e = (u_i, s ^ B_i)
        3. q = B s; wt(q) <= 3         -> e = (q, 0)
        4. exists i: wt(q ^ B_i) <= 2  -> e = (q ^ B_i, u_i)
        5. otherwise uncorrectable.
    """
    cw = codewords.astype(jnp.int32)
    d = cw & 0xFFF
    p = (cw >> 12) & 0xFFF

    # s = B d ^ p  (12-bit), using symmetric-B row masks.
    s = jnp.zeros_like(cw)
    for i in range(12):
        s = s | (_parity_popcount(d & _GOLAY_B_MASKS[i]) << i)
    s = s ^ p

    pc = jax.lax.population_count

    # Case 1.
    e1 = s << 12
    ok1 = pc(s) <= 3

    # Case 2: first i with wt(s ^ B_i) <= 2.
    ok2 = jnp.zeros_like(cw, dtype=bool)
    e2 = jnp.zeros_like(cw)
    for i in range(12):
        cand = s ^ _GOLAY_B_MASKS[i]
        hit = (pc(cand) <= 2) & ~ok2
        e2 = jnp.where(hit, (1 << i) | (cand << 12), e2)
        ok2 = ok2 | hit

    # q = B s.
    q = jnp.zeros_like(cw)
    for i in range(12):
        q = q | (_parity_popcount(s & _GOLAY_B_MASKS[i]) << i)

    # Case 3.
    e3 = q
    ok3 = pc(q) <= 3

    # Case 4.
    ok4 = jnp.zeros_like(cw, dtype=bool)
    e4 = jnp.zeros_like(cw)
    for i in range(12):
        cand = q ^ _GOLAY_B_MASKS[i]
        hit = (pc(cand) <= 2) & ~ok4
        e4 = jnp.where(hit, cand | (1 << (12 + i)), e4)
        ok4 = ok4 | hit

    e = jnp.where(ok1, e1, jnp.where(ok2, e2, jnp.where(ok3, e3, jnp.where(ok4, e4, 0))))
    correctable = ok1 | ok2 | ok3 | ok4

    corrected = jnp.where(correctable, cw ^ e, cw)
    error_count = jnp.where(correctable, pc(e), GOLAY_UNCORRECTABLE_COUNT).astype(
        jnp.int32
    )
    triplets = golay_unpack(corrected & 0xFFF)
    corrected_bits = jnp.sum(jnp.where(correctable, error_count, 0), dtype=jnp.int32)
    uncorrectable_count = jnp.sum(~correctable, dtype=jnp.int32)
    return triplets, error_count, corrected_bits, uncorrectable_count


# =============================================================================
# Codec classes (user-facing API mirroring the reference's Hamming74 /
# Hamming84 / Golay2412 class interfaces)
# =============================================================================


class Hamming74:
    """Hamming(7,4) SEC codec (reference hamming74_triton.py:285)."""

    n_bits = 7
    data_bits = 4

    def encode(self, values):
        return hamming74_encode(jnp.asarray(values))

    def decode(self, codewords):
        data, error_detected, corrected = hamming74_decode(jnp.asarray(codewords))
        return data, error_detected, int(corrected)


class Hamming84:
    """Hamming(8,4) SECDED codec (reference hamming84_triton.py:359)."""

    n_bits = 8
    data_bits = 4

    def encode(self, values):
        return hamming84_encode(jnp.asarray(values))

    def decode(self, codewords, return_error_types=False):
        data, error_type, corrected, detected = hamming84_decode(jnp.asarray(codewords))
        if return_error_types:
            return data, error_type, (int(corrected), int(detected))
        return data, (int(corrected), int(detected))


class Golay2412:
    """Golay(24,12) codec (reference golay_triton.py:506)."""

    n_bits = 24
    data_bits = 12

    def encode(self, triplets):
        return golay_encode(jnp.asarray(triplets))

    def decode(self, codewords):
        triplets, error_count, corrected_bits, uncorrectable = golay_decode(
            jnp.asarray(codewords)
        )
        return triplets, (int(corrected_bits), int(uncorrectable))

    def verify_properties(self):
        """Spot-check the code's algebraic properties (G·Hᵀ=0, min distance
        behavior on random 1-3 bit flips). Full verification lives in
        evaluation/verification.py."""
        from . import algebra as A

        ok = ((A.GOLAY_G.astype(int) @ A.GOLAY_H.astype(int).T) % 2).sum() == 0
        rng = np.random.default_rng(0)
        trip = jnp.asarray(rng.integers(0, 16, size=(64, 3), dtype=np.uint8))
        cw = golay_encode(trip)
        for weight in (1, 2, 3):
            flips = np.zeros(cw.shape, dtype=np.int64)
            for r in range(cw.shape[0]):
                bits = rng.choice(24, size=weight, replace=False)
                for b in bits:
                    flips[r] |= 1 << int(b)
            corrupted = cw ^ jnp.asarray(flips, dtype=jnp.int32)
            dec, _, _, unc = golay_decode(corrupted)
            ok = ok and bool(jnp.all(dec == trip)) and int(unc) == 0
        return bool(ok)
