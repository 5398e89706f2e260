"""SWAR (SIMD-within-a-register) packed codec math for the bit-packed cache.

The round-1 cache stored one codeword per uint8/int32 element, wasting both
HBM bits (int4 spent 8 bits/value) and VPU lanes (each 32-bit lane decoded a
single codeword). This module packs codewords densely into int32 storage
words and decodes them with byte/bit-parallel arithmetic so every VPU op
processes 4-32 values:

  codec      packing (data-first rows)           physical bits/value
  --------   ---------------------------------   -------------------
  int4       8 nibbles / word                    4.0
  hamming74  data nibbles int4-packed, parity    7.0
             bit-sliced 3 planes x 32 cw
  hamming84  data nibbles int4-packed, parity    8.0
             nibbles int4-packed
  golay      data nibbles int4-packed, parity    8.0 (24 bits/cw)
             nibble-plane + byte-plane

Contrast with the reference, which stored one codeword per uint8/int32
element everywhere (ecc_codecs/triton_kernels/config.py:41-70 - bit 7 of
every Hamming(7,4) byte wasted, 8 of 32 bits of every Golay word wasted).

DATA-FIRST ROW ORDER (round-2 final): every codec's row stores the
`data_words()` int4-style-packed data nibbles FIRST, parity after. Two
hardware reasons, both measured on v5e:
  * The per-head page tile the kernel DMAs must span a multiple of 8
    sublanes (one int32 vreg row) or Mosaic pads/strides every page copy:
    golay's original interleaved 33-word rows cost the full decode step
    9.2 ms vs 6.2 ms for the identical kernel on 40-word-aligned rows.
    The data prefix is 16 words for head_dim 128 - always aligned.
  * With ECC patrol scrubbing (correct at write, extract-only reads) the
    steady-state read path never touches parity, so the kernel streams
    ONLY the aligned data prefix: every protected codec reads exactly the
    bytes unprotected INT4 reads, and decode degenerates to the int4
    nibble split. Parity planes stay in HBM and join the stream only on
    correcting reads (scrub=False / stats / interpolation).

Value <-> storage-lane mappings are chosen so that pltpu.bitcast's
int32->int8 sublane interleave (sublane 4j+k of the int8 view = byte k of
word row j) unpacks decoded nibbles STRAIGHT into head-dim order - the fused
attention kernel never runs a shift network or sublane concatenation to
rebuild K^T:

  int4 /     value v <-> see pack_int4: lo nibbles of the byte hold values
  data       [0, D/2), hi nibbles [D/2, D); each bitcast view is identity-
  prefix     ordered over its half. hamming84 and golay store their DATA
             nibbles in exactly this layout (scrub-mode reads are int4
             reads); hamming84 parity nibbles mirror it in the parity half.
  hamming74  data nibbles in the int4 layout (scrub reads ARE int4
             reads); parity bit p of value v at parity plane word
             p*G + v%G, bit v//G (3 bit-sliced planes).
  golay      codeword c protects values (c, c+C4, c+2*C4) - THIRD-
             PARTITIONED over the padded codeword count C4 (the decoded
             nibble planes of the correcting path concatenate along
             sublanes into head-dim order, and the QK^T contraction stays a
             single head_dim-deep MXU pass). Parity is stored after the
             data prefix as a packed nibble plane (cw bits 12-15 + the
             padding values beyond round_up(D,8)) and a byte plane (bits
             16-23) - exact roundtrip, 24 stored bits per codeword.
             Protection statistics are identical to the reference's
             adjacent triplets (ecc_shim.py:678) - any 3 values per 24-bit
             codeword; only the value mapping differs.

All decode helpers are pure jnp on int32 tiles, callable inside Pallas
kernels; all pack helpers run in XLA on the write path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..codecs.algebra import GOLAY_B_ROW_MASKS

_B_MASKS = tuple(int(m) for m in GOLAY_B_ROW_MASKS)
M1 = 0x01010101  # bit 0 of each byte


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# =============================================================================
# hamming84: 4 codewords per int32 word, byte slots (SWAR)
# =============================================================================


def h84_swar_syndromes(x):
    """Per-byte SECDED syndromes of 4 codewords per int32 lane.

    Returns (a, b, c, podd): syndrome bits s0/s1/s2 and odd-overall-parity,
    each as an M1-style mask (bit 0 of every byte)."""
    x1, x2, x3 = x >> 1, x >> 2, x >> 3
    x4, x5, x6 = x >> 4, x >> 5, x >> 6
    a = (x ^ x1 ^ x3 ^ x4) & M1
    b = (x ^ x2 ^ x3 ^ x5) & M1
    c = (x1 ^ x2 ^ x3 ^ x6) & M1
    p = x ^ x4
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    return a, b, c, p & M1


def _h84_data_correction(a, b, c, single):
    """Data-nibble XOR masks from per-byte syndrome bits: syndromes
    {3,5,6,7} flip data bits {0,1,2,3} (kernels/common.py:_h74_data
    _correction_i32), everything else is a parity-bit flip (no-op)."""
    ab = a & b
    corr = (
        (ab & (c ^ M1))
        | ((a & (b ^ M1) & c) << 1)
        | (((a ^ M1) & b & c) << 2)
        | ((ab & c) << 3)
    )
    return corr & (single * 0xF)


def h84_swar_correct_data(x):
    """4 SECDED codewords per int32 lane -> 4 corrected data nibbles per lane
    (byte slots). Single errors corrected, doubles PRESERVE corrupt data -
    identical semantics to hamming84_correct_data_i32, ~4 values per VPU op."""
    a, b, c, podd = h84_swar_syndromes(x)
    single = (a | b | c) & podd
    corr = _h84_data_correction(a, b, c, single)
    return (x ^ corr) & 0x0F0F0F0F


def h84_swar_decode(x):
    """Like h84_swar_correct_data but also returns (singles, doubles) M1
    masks (bit 0 of each byte) for error accounting / interpolation."""
    a, b, c, podd = h84_swar_syndromes(x)
    nonzero = a | b | c
    single = nonzero & podd
    double = nonzero & (podd ^ M1)
    corr = _h84_data_correction(a, b, c, single)
    return (x ^ corr) & 0x0F0F0F0F, single, double


def h84_swar_encode(n):
    """4 nibbles per int32 lane (byte slots, 0x0N each) -> 4 SECDED
    codewords per lane."""
    p0 = (n ^ (n >> 1) ^ (n >> 3)) & M1
    p1 = (n ^ (n >> 2) ^ (n >> 3)) & M1
    p2 = ((n >> 1) ^ (n >> 2) ^ (n >> 3)) & M1
    cw = n | (p0 << 4) | (p1 << 5) | (p2 << 6)
    q = cw ^ (cw >> 4)
    q = q ^ (q >> 2)
    q = q ^ (q >> 1)
    return cw | ((q & M1) << 7)


def pack_bytes4(cw, axis=-1):
    """[..., 4W] byte-sized values -> [..., W] int32 words, byte k of word j
    = element 4j+k (matches pltpu.bitcast's int8-view sublane order)."""
    cw = jnp.moveaxis(cw, axis, -1).astype(jnp.int32)
    shp = cw.shape[:-1] + (cw.shape[-1] // 4, 4)
    g = cw.reshape(shp)
    w = g[..., 0] | (g[..., 1] << 8) | (g[..., 2] << 16) | (g[..., 3] << 24)
    return jnp.moveaxis(w, -1, axis)


def unpack_bytes4(w, axis=-1):
    """Inverse of pack_bytes4: [..., W] int32 -> [..., 4W] bytes (int32)."""
    w = jnp.moveaxis(w, axis, -1).astype(jnp.int32)
    parts = jnp.stack(
        [(w >> (8 * k)) & 0xFF for k in range(4)], axis=-1
    )  # [..., W, 4]
    out = parts.reshape(parts.shape[:-2] + (parts.shape[-2] * 4,))
    return jnp.moveaxis(out, -1, axis)


# =============================================================================
# int4: 8 nibbles per int32 word
# =============================================================================


def pack_int4(vals, axis=-1):
    """[..., D] nibbles -> [..., D/8] int32 words. Byte k of word j holds
    value 4j+k in its LOW nibble and value D/2 + 4j+k in its HIGH nibble, so
    each of the two bitcast int8 views is identity-ordered over one half of
    the head dim."""
    v = jnp.moveaxis(vals, axis, -1).astype(jnp.int32) & 0xF
    D = v.shape[-1]
    lo, hi = v[..., : D // 2], v[..., D // 2 :]
    w = pack_bytes4(lo | (hi << 4), axis=-1)
    return jnp.moveaxis(w, -1, axis)


def unpack_int4(w, axis=-1):
    """Inverse of pack_int4: [..., W] -> [..., 8W] nibbles (int32)."""
    w = jnp.moveaxis(w, axis, -1)
    by = unpack_bytes4(w, axis=-1)  # [..., 4W] bytes
    out = jnp.concatenate([by & 0xF, (by >> 4) & 0xF], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def int4_split(x):
    """Packed int4 words -> (lo, hi) nibble-in-byte-slot tiles; bitcast each
    to int8 for the identity-ordered halves of the head dim."""
    return x & 0x0F0F0F0F, (x >> 4) & 0x0F0F0F0F


# =============================================================================
# hamming74: int4-packed data nibbles + 3 bit-sliced parity planes
# =============================================================================
#
# Round-5 re-layout: the DATA half of every h74 row is pack_int4 of the
# nibbles - byte-identical to the int4/hamming84/golay data prefix - so the
# scrub-extract read path IS the unprotected int4 read (the previous
# 4-data-plane bit-sliced layout made every h74 extract pay a ~35-op
# per-tile bit-expansion, measured +1.27 ms/step at bench shapes vs int4's
# free nibble split). Parity stays bit-sliced: 3 planes x 32 codewords
# (plane p word g bit t = parity bit p of value t*G + g). 7.0 bits/value
# unchanged (pv/8 data words + 3*pv/32 parity words = 7*pv/32).


def _slice_pack(bits_vals, nbits: int, axis=-1):
    """[..., 32G] small ints -> [..., nbits*G] bit-sliced plane words
    (plane-major: word p*G + g holds bit p of value t*G + g at bit t)."""
    x = jnp.moveaxis(bits_vals, axis, -1).astype(jnp.int32)
    pre = x.shape[:-1]
    G = x.shape[-1] // 32
    c = x.reshape(pre + (32, G))  # [..., t, g]
    planes = (c[..., None] >> jnp.arange(nbits)) & 1  # [..., t, g, p]
    words = jnp.sum(
        planes.astype(jnp.int32) << jnp.arange(32)[:, None, None], axis=-3
    )  # [..., g, p]
    nd = len(pre)
    words = jnp.moveaxis(words, -1, nd).reshape(pre + (nbits * G,))
    return jnp.moveaxis(words, -1, axis)


def _slice_unpack(w, nbits: int, axis=-1):
    """Inverse of _slice_pack: [..., nbits*G] plane words -> [..., 32G]."""
    w = jnp.moveaxis(w, axis, -1).astype(jnp.int32)
    pre = w.shape[:-1]
    G = w.shape[-1] // nbits
    planes = w.reshape(pre + (nbits, G))  # [..., p, g]
    bits = (planes[..., None, :, :] >> jnp.arange(32)[:, None, None]) & 1
    # bits: [..., t, p, g]
    cw = jnp.sum(bits << jnp.arange(nbits)[:, None], axis=-2)  # [..., t, g]
    cw = cw.reshape(pre + (32 * G,))
    return jnp.moveaxis(cw, -1, axis)


def h74_split_pack(cw, axis=-1):
    """[..., pv] 7-bit codewords -> [..., 7*pv/32] words, DATA-FIRST split:
    pack_int4 of the data nibbles (pv/8 words), then 3 bit-sliced parity
    planes (3*pv/32 words)."""
    cw = jnp.moveaxis(cw, axis, -1).astype(jnp.int32)
    d = pack_int4(cw & 0xF, axis=-1)
    p = _slice_pack((cw >> 4) & 7, 3, axis=-1)
    return jnp.moveaxis(jnp.concatenate([d, p], axis=-1), -1, axis)


def h74_split_unpack(w, axis=-1):
    """Inverse of h74_split_pack: [..., W] -> [..., 32*W/7] codewords."""
    w = jnp.moveaxis(w, axis, -1).astype(jnp.int32)
    pv = 32 * w.shape[-1] // 7
    d = unpack_int4(w[..., : pv // 8], axis=-1)
    p = _slice_unpack(w[..., pv // 8 :], 3, axis=-1)
    return jnp.moveaxis(d | (p << 4), -1, axis)


def h74_plane_bits(plane, G: int):
    """One parity plane [G, bs] -> per-value bits [32G, bs] int32 0/1
    (value v = t*G + g <-> bit t of plane word g)."""
    rep = jnp.concatenate([plane] * 32, axis=0)
    t = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 0) // G
    return (rep >> t) & 1


def h74_value_correct(d, p0, p1, p2):
    """Per-value Hamming(7,4) correction: d [N, bs] data nibbles, p_i
    [N, bs] parity bits (0/1). Syndromes {3,5,6,7} flip data bits
    {0,1,2,3}; {1,2,4} are parity-bit errors (data untouched). Returns
    (corrected nibbles, nonzero-syndrome mask 0/1) - the mask counts every
    corrected codeword, matching the plane-domain accounting."""
    s0 = (d ^ (d >> 1) ^ (d >> 3) ^ p0) & 1
    s1 = (d ^ (d >> 2) ^ (d >> 3) ^ p1) & 1
    s2 = ((d >> 1) ^ (d >> 2) ^ (d >> 3) ^ p2) & 1
    corr = (
        (s0 & s1 & (s2 ^ 1))
        | ((s0 & (s1 ^ 1) & s2) << 1)
        | (((s0 ^ 1) & s1 & s2) << 2)
        | ((s0 & s1 & s2) << 3)
    )
    return d ^ corr, s0 | s1 | s2


# =============================================================================
# golay: 4 x 24-bit codewords per 3 int32 words, quarter-partitioned
# =============================================================================


def golay_pack_thirds(vals, axis=-1):
    """[..., 3C] nibbles -> [..., C] 12-bit data words, third-partitioned:
    word c = v[c] | v[c+2C]<<4 | v[c+C]<<8 (see module docstring; the
    reference packed adjacent triplets, ecc_shim.py:678 - protection-
    equivalent, mapping differs).

    The SECOND third of the head dim sits in bits 8..11 (the low nibble of
    codeword byte 1) and the LAST third in bits 4..7: after the storage
    bitcast, `full & 0xF` yields value rows [0, 2C) CONTIGUOUSLY (byte-0
    low nibbles then byte-1 low nibbles) and `(full >> 4) & 0xF` rows
    [2C, 3C) - so the scrub-mode extract assembles the K^T tile from two
    SUBLANE-ALIGNED pieces (offsets 0 and 88 for head_dim 128) instead of
    three 44-row concats whose 44-row boundary relayouts every tile."""
    v = jnp.moveaxis(vals, axis, -1).astype(jnp.int32) & 0xF
    c = v.shape[-1] // 3
    w = v[..., :c] | (v[..., 2 * c :] << 4) | (v[..., c : 2 * c] << 8)
    return jnp.moveaxis(w, -1, axis)


def golay_unpack_thirds(data12, axis=-1):
    """Inverse of golay_pack_thirds: [..., C] -> [..., 3C] nibbles."""
    d = jnp.moveaxis(data12, axis, -1).astype(jnp.int32)
    out = jnp.concatenate([d & 0xF, (d >> 8) & 0xF, (d >> 4) & 0xF], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def golay_pack4(cw, axis=-1):
    """[..., 4G] 24-bit codewords -> [..., 3G] int32 words, BYTE-PLANE
    packed: plane p (rows [p*G, (p+1)*G)) holds byte p of the codewords,
    4 per word in pltpu.bitcast order (byte k of word j = codeword 4j+k).

    8.0 bits/value exactly; the kernel expands each plane back to one byte
    per sublane with a single bitcast (no shift network)."""
    cw = jnp.moveaxis(cw, axis, -1).astype(jnp.int32)
    planes = [
        pack_bytes4((cw >> (8 * p)) & 0xFF, axis=-1) for p in range(3)
    ]
    return jnp.moveaxis(jnp.concatenate(planes, axis=-1), -1, axis)


def golay_unpack4(w, axis=-1):
    """Inverse of golay_pack4: [..., 3G] words -> [..., 4G] codewords."""
    w = jnp.moveaxis(w, axis, -1).astype(jnp.int32)
    G = w.shape[-1] // 3
    cw = jnp.zeros(w.shape[:-1] + (4 * G,), jnp.int32)
    for p in range(3):
        b = unpack_bytes4(w[..., p * G : (p + 1) * G], axis=-1)
        cw = cw | (b << (8 * p))
    return jnp.moveaxis(cw, -1, axis)


# =============================================================================
# Data-first split rows: hamming84 and golay (see module docstring)
# =============================================================================


def h84_split_pack(cw, axis=-1):
    """[..., pv] 8-bit SECDED codewords -> [..., pv/4] int32 words,
    DATA-FIRST: words [0, pv/8) = pack_int4 of the data nibbles, words
    [pv/8, pv/4) = pack_int4 of the parity nibbles (cw >> 4)."""
    cw = jnp.moveaxis(cw, axis, -1).astype(jnp.int32)
    d = pack_int4(cw & 0xF, axis=-1)
    p = pack_int4((cw >> 4) & 0xF, axis=-1)
    return jnp.moveaxis(jnp.concatenate([d, p], axis=-1), -1, axis)


def h84_split_unpack(w, axis=-1):
    """Inverse of h84_split_pack: [..., W] -> [..., 4W] codewords."""
    w = jnp.moveaxis(w, axis, -1).astype(jnp.int32)
    half = w.shape[-1] // 2
    d = unpack_int4(w[..., :half], axis=-1)
    p = unpack_int4(w[..., half:], axis=-1)
    return jnp.moveaxis(d | (p << 4), -1, axis)


def h84_rebuild_cw_words(dw, pw):
    """(data words, parity words) int32 [..., half] each -> byte-slot
    codeword words (lo, hi): lo holds the codewords of values [0, pv/2),
    hi of [pv/2, pv), both identity-ordered after an int8 bitcast. The
    fused kernel's correcting path runs h84_swar_correct_data on each."""
    lo = (dw & 0x0F0F0F0F) | ((pw & 0x0F0F0F0F) << 4)
    hi = ((dw >> 4) & 0x0F0F0F0F) | (((pw >> 4) & 0x0F0F0F0F) << 4)
    return lo, hi


def golay_data_nibbles(head_dim: int) -> int:
    """Nibble count of the golay row's int4-packed data prefix: round_up
    (head_dim, 8) when the padded value count allows it, else rounded DOWN
    to the previous multiple of 8 (pv = 3*C4 can be smaller than
    round_up(head_dim, 8), e.g. head_dim 33 -> pv 36 < 40, head_dim 60 ->
    pv 60 < 64). The word arithmetic closes for any multiple of 8:
    prefix rd/8 + ptail (4*C4 - rd)/8 + phi C4/4 = 3*C4/4 = row_words.
    When rd < head_dim the prefix does not cover every value, so the scrub
    extract fast path is unavailable (golay_prefix_covers_values)."""
    pv = padded_values("golay", head_dim)
    rd = round_up(head_dim, 8)
    return rd if rd <= pv else pv - pv % 8


def golay_prefix_covers_values(head_dim: int) -> bool:
    """True iff values [0, head_dim) all live in the golay data prefix -
    the precondition for the scrub extract-only read path."""
    return golay_data_nibbles(head_dim) >= head_dim


def golay_split_pack(cw, head_dim: int, axis=-1):
    """[..., C4] 24-bit golay codewords -> [..., 3*C4/4] int32 words,
    DATA-FIRST (W = 3*C4/4, exactly 24 stored bits per codeword):

      words [0, rD/8)        pack_int4 of data nibbles for values
                             [0, rD) in thirds order (rD = round_up(D, 8))
      words [rD/8, W - C4/4) pack_int4 of [plo (C4 nibbles, cw bits
                             12-15), data nibbles of padding values
                             [rD, 3*C4)] - exact roundtrip incl. padding
      words [W - C4/4, W)    byte plane of phi (cw bits 16-23)
    """
    cw = jnp.moveaxis(cw, axis, -1).astype(jnp.int32)
    rd = golay_data_nibbles(head_dim)
    nib = golay_unpack_thirds(cw & 0xFFF, axis=-1)  # [..., 3C4] identity
    d = pack_int4(nib[..., :rd], axis=-1)
    ptail = jnp.concatenate([(cw >> 12) & 0xF, nib[..., rd:]], axis=-1)
    p = pack_int4(ptail, axis=-1)
    ph = pack_bytes4((cw >> 16) & 0xFF, axis=-1)
    return jnp.moveaxis(jnp.concatenate([d, p, ph], axis=-1), -1, axis)


def golay_split_unpack(w, head_dim: int, axis=-1):
    """Inverse of golay_split_pack: [..., W] -> [..., 4W/3] codewords."""
    w = jnp.moveaxis(w, axis, -1).astype(jnp.int32)
    W = w.shape[-1]
    c4 = 4 * W // 3
    rd = golay_data_nibbles(head_dim)
    d_nib = unpack_int4(w[..., : rd // 8], axis=-1)  # [..., rD]
    ptail = unpack_int4(w[..., rd // 8 : W - c4 // 4], axis=-1)
    plo, padnib = ptail[..., :c4], ptail[..., c4:]
    nib = jnp.concatenate([d_nib, padnib], axis=-1)  # [..., 3C4]
    d12 = golay_pack_thirds(nib, axis=-1)
    phi = unpack_bytes4(w[..., W - c4 // 4 :], axis=-1)
    cw = d12 | (plo << 12) | (phi << 16)
    return jnp.moveaxis(cw, -1, axis)


# =============================================================================
# Counter-hash Bernoulli flips (read-time injection inside kernels)
# =============================================================================


def _murmur_mix(z):
    """murmur3 finalizer on int32 lanes - a statistically solid counter
    hash from pure VPU ops (portable: identical bits compiled on TPU and
    in the Pallas interpreter, unlike pltpu.prng_* which has no CPU
    lowering)."""
    z = z ^ ((z >> 16) & 0xFFFF)
    z = z * jnp.int32(-2048144789)  # 0x85EBCA6B
    z = z ^ ((z >> 13) & 0x7FFFF)
    z = z * jnp.int32(-1028477387)  # 0xC2B2AE35
    z = z ^ ((z >> 16) & 0xFFFF)
    return z


def hash_flip_mask(seed, base, shape, threshold: int, n_bits: int = 32):
    """Deterministic Bernoulli bit-flip mask for a kernel tile.

    Each of the lower n_bits of each element flips independently with
    probability threshold / 2^32. `seed` is a traced int32 scalar; `base`
    a traced int32 distinguishing the tile (the (tile, element, bit)
    triple indexes a unique counter, mirroring the reference's
    fault_injection_triton.py:247 seed formula)."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    l = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    elem = r * shape[-1] + l
    # unsigned compare via sign-bit trick: (u32)x < (u32)t
    tb = (int(threshold) ^ (1 << 31)) & 0xFFFFFFFF
    tbias = jnp.int32(tb - (1 << 32) if tb >= (1 << 31) else tb)
    mask = jnp.zeros(shape, jnp.int32)
    for b in range(n_bits):
        c = (base + elem) * jnp.int32(n_bits) + b
        z = _murmur_mix(c * jnp.int32(-1640531527) + seed)  # 0x9E3779B9
        flip = (z ^ jnp.int32(-(1 << 31))) < tbias
        mask = mask | (flip.astype(jnp.int32) << b)
    return mask


# =============================================================================
# Unified row packing (engine / runtime write path; jnp, XLA-land)
# =============================================================================


def padded_values(codec: str, head_dim: int) -> int:
    """Protected values per row after padding to the codec's packing
    granularity."""
    if codec == "int4":
        return round_up(head_dim, 8)
    if codec == "hamming74":
        return round_up(head_dim, 32)
    if codec == "hamming84":
        return round_up(head_dim, 8)
    if codec == "golay":
        return 3 * round_up(-(-head_dim // 3), 4)
    return head_dim  # fp16 / fp8 store raw values


def row_words(codec: str, head_dim: int) -> int:
    """int32 storage words per (token, head) row (fp16/fp8: elements)."""
    pv = padded_values(codec, head_dim)
    if codec == "int4":
        return pv // 8
    if codec == "hamming74":
        return 7 * pv // 32
    if codec == "hamming84":
        return pv // 4
    if codec == "golay":
        return 3 * (pv // 3) // 4
    return head_dim


def data_words(codec: str, head_dim: int) -> int:
    """int32 words of the row's DATA prefix - the only words a scrub-mode
    read streams and decodes (data-first row order; always a multiple of
    2 sublane-aligned int4-packed words for the ECC codecs at production
    head dims, 16 words for head_dim 128)."""
    if codec == "golay":
        return golay_data_nibbles(head_dim) // 8
    if codec in ("int4", "hamming84"):
        return round_up(head_dim, 8) // 8
    if codec == "hamming74":
        return round_up(head_dim, 32) // 8  # int4-packed data nibbles
    return head_dim  # fp16 / fp8: the whole row is data


def parity_words(codec: str, head_dim: int) -> int:
    """int32 words of the row's parity suffix (0 for int4/fp16/fp8 - their
    rows are all data). Round 5 stores this suffix in PHYSICALLY SEPARATE
    cache arrays (cache/layout.py): the data arrays become byte-identical
    to the unprotected int4 cache (fully contiguous page DMAs) and the
    parity suffix is scattered/streamed independently - removing the
    strided-DMA and parity-RMW overhead terms measured in round 4
    (RESULTS.md, docs/split_parity_design.md)."""
    return row_words(codec, head_dim) - data_words(codec, head_dim)


def split_rows(codec: str, packed, head_dim: int, axis: int = -1):
    """Split full packed rows [..., row_words] (pack_codewords output) into
    the (data, parity) pair stored in the split cache arrays. Pure slicing
    at the data-first boundary; parity is None when the codec has none."""
    dw = data_words(codec, head_dim)
    packed = jnp.moveaxis(packed, axis, -1)
    if parity_words(codec, head_dim) == 0:
        return jnp.moveaxis(packed, -1, axis), None
    return (
        jnp.moveaxis(packed[..., :dw], -1, axis),
        jnp.moveaxis(packed[..., dw:], -1, axis),
    )


def join_rows(codec: str, data, parity, axis: int = -1):
    """Inverse of split_rows: rebuild full rows for the jnp decode paths."""
    if parity is None:
        return data
    return jnp.concatenate([data, parity], axis=axis)


def scrub_extract_ok(codec: str, head_dim: int) -> bool:
    """True iff the scrub extract-only read path is available: every value
    in [0, head_dim) must live in the row's int4-packed data prefix. Only
    golay can violate this (golay_data_nibbles < head_dim for head dims
    like 33 or 60); the kernel then keeps scrub write semantics but reads
    through the correcting decode path - observationally identical on a
    scrubbed cache, just without the extract speedup."""
    if codec == "golay":
        return golay_prefix_covers_values(head_dim)
    return True


def pack_codewords(codec: str, cw, head_dim: int, axis=-1):
    """Per-value codeword array -> packed int32 storage words.

    cw (along `axis`): int4/hamming74/hamming84: padded_values() elements
    (nibbles / 7-bit / 8-bit codewords); golay: padded_values()//3 24-bit
    codewords. Fault injection happens BEFORE packing (on logical codeword
    bits), so packing is a pure bit relabeling."""
    if codec == "int4":
        return pack_int4(cw, axis=axis)
    if codec == "hamming74":
        return h74_split_pack(cw, axis=axis)
    if codec == "hamming84":
        return h84_split_pack(cw, axis=axis)
    if codec == "golay":
        return golay_split_pack(cw, head_dim, axis=axis)
    raise ValueError(codec)


def unpack_codewords(codec: str, w, head_dim: int, axis=-1):
    """Inverse of pack_codewords (the jnp oracle/prefill read path)."""
    if codec == "int4":
        return unpack_int4(w, axis=axis)
    if codec == "hamming74":
        return h74_split_unpack(w, axis=axis)
    if codec == "hamming84":
        return h84_split_unpack(w, axis=axis)
    if codec == "golay":
        return golay_split_unpack(w, head_dim, axis=axis)
    raise ValueError(codec)


def encode_row(codec: str, q, head_dim: int):
    """Quantized nibbles [..., head_dim] -> packed int32 words [..., W],
    WITHOUT fault injection (inject on the logical codewords via
    encode_codewords + pack_codewords when a BER is active)."""
    return pack_codewords(codec, encode_codewords(codec, q, head_dim), head_dim)


def golay_data12(q, head_dim: int):
    """Quantized nibbles [..., head_dim] -> third-partitioned 12-bit data
    words [..., C4]: the golay padding + packing step, shared by
    encode_codewords and the fused write-scrub path (models/kv_policy.py:
    encode_kv_scrubbed) so the two can never silently diverge - the
    injection mask stream is keyed on this array's shape."""
    pv = padded_values("golay", head_dim)
    pad = pv - head_dim
    if pad:
        q = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, pad)])
    return golay_pack_thirds(q.astype(jnp.int32) & 0xF)


def encode_codewords(codec: str, q, head_dim: int):
    """Quantized nibbles [..., head_dim] -> per-value logical codeword array
    (the injection domain), padded to the codec's packing granularity."""
    from . import common as C

    if codec == "golay":
        return golay_encode_wide(golay_data12(q, head_dim))
    pv = padded_values(codec, head_dim)
    pad = pv - head_dim
    if pad:
        q = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, pad)])
    q = q.astype(jnp.int32) & 0xF
    if codec == "int4":
        return q
    if codec == "hamming74":
        return C.hamming74_encode_i32(q)
    if codec == "hamming84":
        return C.hamming84_encode_i32(q)
    raise ValueError(codec)


def _bm_bcast(ndim):
    """GOLAY B-row masks stacked on a leading candidate axis, broadcastable
    against an ndim-rank codeword tensor."""
    return jnp.asarray(_B_MASKS, jnp.int32).reshape((12,) + (1,) * ndim)


_I12 = lambda ndim: jnp.arange(12, dtype=jnp.int32).reshape(  # noqa: E731
    (12,) + (1,) * ndim)


def golay_encode_wide(data12):
    """12-bit data -> 24-bit codewords, candidate-axis-vectorized.

    Identical math to common.golay_encode_i32 but the 12-row parity loop
    runs as ONE set of ops on a leading [12] axis instead of 12 serial
    iterations. The jnp WRITE path is latency-bound on tiny decode-step
    tensors ([B, 1, Hkv, C] per layer, 24 strictly-serial layers), so a
    ~12x shorter dependency chain is a direct step-time win; inside Pallas
    kernels the per-lane serial form stays (vreg pressure dominates there).
    """
    bm, iv = _bm_bcast(data12.ndim), _I12(data12.ndim)
    par = (jax.lax.population_count(data12[None] & bm) & 1) << iv
    return data12 | (par.sum(0) << 12)


def golay_parity_xor(d12):
    """12 parity bits of 12-bit data words via a fixed 36-op XOR chain:
    p = d12 . B over GF(2), computed as XOR over set data bits j of B's
    j-th COLUMN (= row: B is symmetric). No [12, ...] broadcast tensor
    and no reduction - the whole thing is one fusable elementwise chain,
    which matters on the decode step's tiny per-layer [B, 1, H, C4]
    tensors where golay_encode_wide's candidate-axis form paid a 12x
    intermediate + reduce per (layer, K/V) (round 5, measured). Bit-
    identical to (golay_encode_wide(d12) >> 12) & 0xFFF."""
    p = jnp.zeros_like(d12)
    for j in range(12):
        p = p ^ (-((d12 >> j) & 1) & _B_MASKS[j])
    return p


def golay_pack_rows_from_nibbles(qn, head_dim: int):
    """Padded data nibbles [..., 3*C4] (thirds order, values & 0xF) ->
    packed storage rows [..., W], data-first split layout. Bit-identical to
    golay_split_pack(golay_encode_wide(golay_pack_thirds(qn)), head_dim)
    but skips the pack->unpack roundtrip and the candidate-axis parity:
    the decode step's per-layer write chain calls this directly
    (models/kv_policy.py:encode_pack_kv_scrubbed)."""
    qn = jnp.asarray(qn, jnp.int32) & 0xF
    d12 = golay_pack_thirds(qn)
    p12 = golay_parity_xor(d12)
    rd = golay_data_nibbles(head_dim)
    d = pack_int4(qn[..., :rd])
    ptail = pack_int4(jnp.concatenate([p12 & 0xF, qn[..., rd:]], axis=-1))
    ph = pack_bytes4((p12 >> 4) & 0xFF)
    return jnp.concatenate([d, ptail, ph], axis=-1)


def golay_decode_wide(cw, *, zero_uncorrectable):
    """Arithmetic IMLD Golay decode, candidate-axis-vectorized.

    Bit-identical to common.golay_decode_i32 (differential-tested over all
    weight<=5 error patterns, tests/test_swar_split.py): the four
    12-candidate loops become single ops on a leading [12] axis. The
    within-stage first-hit select chains are replaced by sums, valid
    because at most one candidate can hit per stage (B rows are pairwise
    >= 6 apart, so pc(s^B_i) <= 2 excludes every other row).

    Returns (data12, error_count 0-3 | 4).
    """
    pc = jax.lax.population_count
    d = cw & 0xFFF
    p = (cw >> 12) & 0xFFF
    bm, iv = _bm_bcast(cw.ndim), _I12(cw.ndim)

    s = ((pc(d[None] & bm) & 1) << iv).sum(0) ^ p
    e1 = s << 12
    ok1 = pc(s) <= 3

    cand2 = s[None] ^ bm
    hit2 = pc(cand2) <= 2
    e2 = jnp.where(hit2, (1 << iv) | (cand2 << 12), 0).sum(0)
    ok2 = hit2.any(0)

    q = ((pc(s[None] & bm) & 1) << iv).sum(0)
    e3 = q
    ok3 = pc(q) <= 3

    cand4 = q[None] ^ bm
    hit4 = pc(cand4) <= 2
    e4 = jnp.where(hit4, cand4 | (1 << (12 + iv)), 0).sum(0)
    ok4 = hit4.any(0)

    e = jnp.where(
        ok1, e1, jnp.where(ok2, e2, jnp.where(ok3, e3, jnp.where(ok4, e4, 0)))
    )
    correctable = ok1 | ok2 | ok3 | ok4
    data = (cw ^ e) & 0xFFF
    if zero_uncorrectable:
        data = jnp.where(correctable, data, 0)
    else:
        data = jnp.where(correctable, data, cw & 0xFFF)
    return data, jnp.where(correctable, pc(e), 4)


def scrub_fold_mask(codec: str, mask):
    """Fold the write-path scrub INTO the injection mask (round-4 design).

    For a linear code, the correction the scrub decoder applies to
    `encode(q) ^ mask` depends only on the mask: syndromes are linear and
    every valid codeword has syndrome 0, so s(encode(q) ^ mask) = s(mask)
    and the decoder's error estimate e = e(mask). The scrubbed-and-stored
    codeword is therefore

        scrub_codewords(codec, encode(q) ^ mask)
            == encode(q ^ delta)            delta = correct_data(mask)

    i.e. the whole correction - INCLUDING golay's ~250-op IMLD - can run
    on the mask alone, which the decode loop pre-draws in one bulk chain
    across all layers and steps (models/kv_policy.py:hoisted_write_deltas).
    The per-layer write chain collapses to quantize -> xor delta ->
    encode -> pack for every codec: identical shape to the unprotected
    int4 chain, no scrub kernel launch, no per-layer IMLD.

    Returns the DATA-domain delta in the NIBBLE domain for every codec
    (uint8-rangeable, one element per protected value):
      int4 / hamming74 / hamming84: nibble delta (<= 4 bits; mask shape)
      golay: per-VALUE delta nibble | (uncorrectable << 4) over the padded
             value array [..., 3C] (thirds order, golay_unpack_thirds of
             the [..., C] mask domain) - apply as
             q' = where(bit4, 0, q ^ (delta & 0xF)). Valid because the
             uncorrectable case scrubs to the all-zero codeword
             (encode(0) == 0 by linearity) and zeroing all three data
             nibbles of a codeword zeroes its d12. Keeping the per-layer
             consumption h84-SHAPED (uint8 elementwise over padded
             nibbles) moves golay's unpack_thirds into the bulk hoist and
             halves the hoisted buffer (uint8 vs uint16)."""
    from . import common as C

    mask = jnp.asarray(mask, jnp.int32)
    if codec == "int4":
        return mask & 0xF
    if codec == "hamming74":
        return C.hamming74_correct_data_i32(mask)
    if codec == "hamming84":
        return C.hamming84_correct_data_i32(mask)
    if codec == "golay":
        d, cnt = golay_decode_wide(mask, zero_uncorrectable=False)
        dn = golay_unpack_thirds(d)  # [..., 3C] nibble deltas, thirds order
        # value v lives in codeword v % C (thirds are stacked contiguously:
        # [0,C) third 0, [C,2C) third 1, [2C,3C) third 2), so the per-
        # codeword uncorrectable flag TILES three times along values
        un = jnp.concatenate([(cnt == 4).astype(jnp.int32)] * 3, axis=-1)
        return dn | (un << 4)
    raise ValueError(codec)


def scrub_codewords(codec: str, cw):
    """Write-path scrub: decode each (possibly fault-injected) logical
    codeword and RE-ENCODE its corrected data, so the stored form is always
    a valid codeword (uncorrectable Golay -> the all-zero codeword, which
    decodes to 0 forever - the zero_uncorrectable read semantics; Hamming84
    doubles re-encode their preserved data). Corrections are deterministic
    and idempotent, so decoded values are bit-identical to storing the raw
    corrupted codeword and correcting at every read - but reads degenerate
    to data-bit extraction (the fused kernel's scrub fast path)."""
    from . import common as C

    if codec == "int4":
        return cw  # nothing to correct
    if codec == "hamming74":
        return C.hamming74_encode_i32(C.hamming74_correct_data_i32(cw))
    if codec == "hamming84":
        return C.hamming84_encode_i32(C.hamming84_correct_data_i32(cw))
    if codec == "golay":
        d12, _ = golay_decode_wide(cw, zero_uncorrectable=True)
        return golay_encode_wide(d12)
    raise ValueError(codec)


def decode_values(codec: str, cw, head_dim: int, *, zero_uncorrectable=False):
    """Logical codewords -> corrected nibbles [..., head_dim] (jnp oracle
    path; stats-free). Mirrors the fused kernel's data-only correctors."""
    from . import common as C

    if codec == "int4":
        dec = cw & 0xF
    elif codec == "hamming74":
        dec = C.hamming74_correct_data_i32(cw)
    elif codec == "hamming84":
        dec = C.hamming84_correct_data_i32(cw)
    elif codec == "golay":
        d12, _ = golay_decode_wide(cw, zero_uncorrectable=zero_uncorrectable)
        dec = golay_unpack_thirds(d12)
    else:
        raise ValueError(codec)
    return dec[..., :head_dim]
