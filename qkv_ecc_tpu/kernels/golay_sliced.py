"""Bit-sliced Golay(24,12) IMLD decode: 32 codewords per VPU op.

The per-lane arithmetic IMLD decoder (kernels/common.py:golay_decode_i32)
costs ~250 VPU ops per codeword LANE - one 24-bit codeword per 32-bit lane,
every popcount/XOR/select touching a single codeword. At bench shapes that
is ~12 ms/step of pure VPU issue, 3x the unprotected-INT4 step. This module
removes the per-lane bottleneck by storing the Golay cache BIT-SLICED: bit b
of 32 codewords packed into one int32 word, so every AND/XOR/OR of the IMLD
network processes 32 codewords at once, and per-codeword POPCOUNTS become
shared boolean adder networks (full-adder trees over planes).

Round-2 postmortem constraints this layout was designed around (CLAUDE.md):
a bit-sliced plane is only worth issuing if it spans >= 8 sublanes, and the
storage must stay dense. Packing codeword rows across the LOCAL KV-HEAD SET
delivers both:

    rows per (token) = kv_heads x cw_per_head = 8 x 48 = 384 = 12 x 32
    => each bit-plane is a [G=12, block_size] int32 slab (>= 8 sublanes),
       no padding codewords for even head counts.

cw_per_head is padded 43 -> 48 so per-head value slices stay sublane-aligned
(48h = 0 mod 16 in bf16 rows); golay storage is 9.0 bits/value vs the
previous per-head byte-plane layout's 8.25 - a +9% HBM trade for a ~4x
decode-op cut (measured in RESULTS.md).

Layout. Codeword row r (= h * cw_per_head + c, h the kv head, c the in-head
codeword) lives at bit position z of plane word g, with

    u = r // 4, k = r % 4, g = u % G, z = 4 * (u // G) + k

so the four codewords 4u..4u+3 occupy ADJACENT bits [4*(u//G), +4) of the
same word - chosen so decode-side unpack is two cheap tricks per plane:
  * block-concat repeat: jnp.concatenate([plane]*8) maps output word-row u
    to source row u % G with NO interleaving relayout, and the shift amount
    4*(u//G) is constant within each G-row block (one vector shift);
  * multiply-spread: (bits4 * 0x00204081) & 0x01010101 fans the 4 adjacent
    bits out to 4 byte lanes, landing nibble t of codeword 4u+k in byte k of
    word u - i.e. pltpu.bitcast(int8) row 4u+k IS codeword row r's value,
    identity-ordered. No 32-way bit transpose ever happens.

Per-head K^T tiles are then 16-row-aligned bf16 slices [48h, 48h+48) of the
three nibble blocks (value v = 48*t + c, third-partitioned over C=48).

The IMLD network itself (golay_sliced_correct_planes) mirrors the four
stages of the per-lane decoder (codecs/reference.py:golay_decode_algebraic,
differential-tested against the syndrome-LUT oracle):
  1. wt(s) <= 3                -> e = (0 | s)
  2. wt(s ^ B_i) <= 2 some i   -> e = (u_i | s ^ B_i)
  3. wt(q) <= 3, q = B s       -> e = (q | 0)
  4. wt(q ^ B_i) <= 2 some i   -> e = (q ^ B_i | u_i)
with weights computed ONCE per stage as shared full-adder triples: the 12
candidate tests of stages 2/4 reuse 4 masked-triple (sum, carry) pairs,
with majority-complement identities (maj(~a,~b,~c) = ~maj(a,b,c)) deduping
the 8 possible 3-bit mask variants per triple.

Reference contrast: the reference never fused Golay at all (its Triton
path falls back to Python for golay, kv_cache/attention_ecc.py:759-775)
and stored one codeword per int32 element (triton config.py:41-70).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..codecs.algebra import GOLAY_B_ROW_MASKS

_B = tuple(int(m) for m in GOLAY_B_ROW_MASKS)
_TRIPLES = ((0, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11))
_SPREAD = 0x00204081  # bit b -> byte b (b<4): x*_SPREAD & 0x01010101
_M1 = 0x01010101


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def cw_per_head(head_dim: int) -> int:
    """Codewords per (token, head): ceil(head_dim/3) padded to 8 so per-head
    value slices are 16-row-aligned in bf16 (48 for head_dim 128)."""
    return round_up(cdiv(head_dim, 3), 8)


def sliced_values_per_head(head_dim: int) -> int:
    return 3 * cw_per_head(head_dim)


def num_groups(kv_heads: int, head_dim: int) -> int:
    """G: plane words per (token). 32G >= kv_heads * cw_per_head; exact for
    even head counts at head_dim 128 (8 heads -> G = 12)."""
    return cdiv(kv_heads * cw_per_head(head_dim), 32)


def sliced_row_words(kv_heads: int, head_dim: int) -> int:
    """Total int32 storage words per token across ALL local kv heads."""
    return 24 * num_groups(kv_heads, head_dim)


@functools.cache
def _row_of_gz(G: int):
    """numpy [G, 32] -> codeword row index r for (g, z)."""
    g = np.arange(G)[:, None]
    z = np.arange(32)[None, :]
    return (4 * (g + G * (z // 4)) + z % 4).astype(np.int32)


@functools.cache
def _gz_of_row(G: int):
    """numpy [32G] -> (g, z) for codeword row r."""
    u, k = np.arange(32 * G) // 4, np.arange(32 * G) % 4
    return (u % G).astype(np.int32), (4 * (u // G) + k).astype(np.int32)


def valid_row_masks(G: int, n_rows: int):
    """numpy int32 [G]: bit z set iff row r(g, z) < n_rows (masks the
    padding codewords of odd head counts out of error statistics)."""
    r = _row_of_gz(G)
    m = ((r < n_rows).astype(np.int64) << np.arange(32)[None, :]).sum(axis=1)
    return m.astype(np.uint32).view(np.int32)


def golay_slice_pack(cw, G: int, axis=-1):
    """[..., R] 24-bit codewords (R <= 32G, zero-padded) -> [..., 24G]
    bit-plane words, plane-major (plane p = words [p*G, (p+1)*G))."""
    cw = jnp.moveaxis(cw, axis, -1).astype(jnp.int32)
    R = cw.shape[-1]
    if R < 32 * G:
        cw = jnp.pad(cw, [(0, 0)] * (cw.ndim - 1) + [(0, 32 * G - R)])
    r = jnp.asarray(_row_of_gz(G))  # [G, 32]
    c = cw[..., r]  # [..., G, 32] codeword at (g, z)
    z = jnp.arange(32)
    # one plane at a time: peak memory stays O(input), not 24x
    words = [jnp.sum(((c >> p) & 1) << z, axis=-1) for p in range(24)]
    words = jnp.concatenate(words, axis=-1)  # [..., 24G] plane-major
    return jnp.moveaxis(words, -1, axis)


def golay_slice_unpack(w, G: int, n_rows: int | None = None, axis=-1):
    """Inverse of golay_slice_pack: [..., 24G] plane words -> [..., R]
    24-bit codewords (R = n_rows or 32G)."""
    w = jnp.moveaxis(w, axis, -1).astype(jnp.int32)
    gi, zi = (jnp.asarray(a) for a in _gz_of_row(G))
    cw = None
    for p in range(24):
        plane = w[..., p * G : (p + 1) * G]
        b = ((plane[..., gi] >> zi) & 1) << p  # [..., R32]
        cw = b if cw is None else cw | b
    if n_rows is not None:
        cw = cw[..., :n_rows]
    return jnp.moveaxis(cw, -1, axis)


# -----------------------------------------------------------------------------
# The bit-sliced IMLD network
# -----------------------------------------------------------------------------


def _xor_planes(planes, mask: int, extra=None):
    acc = extra
    for j in range(12):
        if (mask >> j) & 1:
            acc = planes[j] if acc is None else acc ^ planes[j]
    return acc


class _TripleBank:
    """Shared masked full-adder triples over one 12-plane vector.

    For triple (a, b, c) and 3-bit complement mask m, provides
    (sum, carry) of (a^m0) + (b^m1) + (c^m2), deduping via:
      sum_m  = sum ^ parity(m)            (one shared complement)
      maj(~a,~b,~c) = ~maj(a,b,c)         (complement-class sharing)
    """

    def __init__(self, planes):
        self.p = planes
        self._sum = {}  # t -> base sum
        self._nsum = {}
        self._maj = {}  # (t, class_mask) -> maj plane
        self._x = {}
        self._ab = {}

    def _base(self, t):
        if t not in self._sum:
            a, b, c = (self.p[j] for j in _TRIPLES[t])
            x = a ^ b
            self._x[t] = x
            self._ab[t] = a & b
            self._sum[t] = x ^ c
            self._maj[(t, 0)] = self._ab[t] | (c & x)

    def sum(self, t, m):
        self._base(t)
        if bin(m).count("1") % 2 == 0:
            return self._sum[t]
        if t not in self._nsum:
            self._nsum[t] = ~self._sum[t]
        return self._nsum[t]

    def carry(self, t, m):
        self._base(t)
        if (t, m) in self._maj:
            return self._maj[(t, m)]
        comp = (~m) & 7
        if (t, comp) in self._maj:
            v = ~self._maj[(t, comp)]
        else:
            a, b, c = (self.p[j] for j in _TRIPLES[t])
            # compute the canonical single-complement representative
            base = m if bin(m).count("1") == 1 else comp
            if base == 1:
                v = (b & c) | (~a & (b ^ c))
            elif base == 2:
                v = (a & c) | (~b & (a ^ c))
            else:  # base == 4
                v = self._ab[t] | (~c & self._x[t])
            self._maj[(t, base)] = v
            if base != m:
                v = ~v
        self._maj[(t, m)] = v
        return v

    def pairs(self, mask12: int):
        """[(sum, carry)] over the 4 triples for complement mask mask12."""
        return [
            (self.sum(t, (mask12 >> (3 * t)) & 7),
             self.carry(t, (mask12 >> (3 * t)) & 7))
            for t in range(4)
        ]


def _wt_le3(pairs):
    """wt <= 3 from 4 (sum, carry) pairs: C==0 & S<=3  or  C==1 & S<=1."""
    (s1, c1), (s2, c2), (s3, c3), (s4, c4) = pairs
    o01, o23 = s1 | s2, s3 | s4
    a01, a23 = s1 & s2, s3 & s4
    oc01, oc23 = c1 | c2, c3 | c4
    any_c = oc01 | oc23
    two_c = (oc01 & oc23) | (c1 & c2) | (c3 & c4)
    ge2_s = a01 | a23 | (o01 & o23)
    le3_s = ~(a01 & a23)
    return (~any_c & le3_s) | (any_c & ~two_c & ~ge2_s)


def _wt_le2(pairs):
    """wt <= 2 from 4 (sum, carry) pairs: C==0 & S<=2  or  C==1 & S==0."""
    (s1, c1), (s2, c2), (s3, c3), (s4, c4) = pairs
    o01, o23 = s1 | s2, s3 | s4
    a01, a23 = s1 & s2, s3 & s4
    ge3_s = (a01 & o23) | (a23 & o01)
    any_s = o01 | o23
    oc01, oc23 = c1 | c2, c3 | c4
    any_c = oc01 | oc23
    two_c = (oc01 & oc23) | (c1 & c2) | (c3 & c4)
    return ~two_c & ((~any_c & ~ge3_s) | (any_c & ~any_s))


def _sweep(planes):
    """One IMLD half-stage over a 12-plane vector: returns
    (le3 mask, [hit_i planes for the 12 candidates], any_hit)."""
    bank = _TripleBank(planes)
    le3 = _wt_le3(bank.pairs(0))
    hits = [_wt_le2(bank.pairs(_B[i])) for i in range(12)]
    any_hit = hits[0]
    for h in hits[1:]:
        any_hit = any_hit | h
    return le3, hits, any_hit


def _col_or(hits, j: int):
    """OR of hit_i over candidates i whose B row has bit j (column j of B;
    B is symmetric, so column j mask == row j mask)."""
    acc = None
    for i in range(12):
        if (_B[j] >> i) & 1:
            acc = hits[i] if acc is None else acc | hits[i]
    return acc


def golay_sliced_correct_plane_list(d, p, *, full_errors: bool = False):
    """Bit-sliced IMLD over 12 data planes `d` and 12 parity planes `p`
    (each [G, bs] int32). Returns (data_planes LIST, correctable, errs with
    errs = (e_data list, e_par list) or None).

    Operating on individual plane arrays (not sublane slices of one
    [24G, bs] array) matters on hardware: G is rarely 0 mod 8, so slicing
    rows [pG, (p+1)G) relayouts every other plane and poisons the whole
    network (measured ~1.6x; CLAUDE.md sublane-alignment trap)."""
    s = [_xor_planes(d, _B[i], p[i]) for i in range(12)]
    ok1, hits2, any2 = _sweep(s)

    q = [_xor_planes(s, _B[i]) for i in range(12)]
    ok3, hits4, any4 = _sweep(q)

    n1 = ~ok1
    sel2 = n1 & any2
    n12 = n1 & ~any2
    sel3 = n12 & ok3
    sel4 = n12 & ~ok3 & any4
    correctable = ok1 | any2 | sel3 | sel4
    sel34 = sel3 | sel4

    out, ed = [], []
    for j in range(12):
        e = (hits2[j] & sel2) | (q[j] & sel34)
        x4 = _col_or(hits4, j)
        if x4 is not None:
            e = e ^ (x4 & sel4)
        out.append((d[j] ^ e) & correctable)
        if full_errors:
            ed.append(e)

    errs = None
    if full_errors:
        pe = []
        for j in range(12):
            ep = s[j] & (ok1 | sel2)
            x2 = _col_or(hits2, j)
            if x2 is not None:
                ep = ep ^ (x2 & sel2)
            pe.append(ep | (hits4[j] & sel4))
        errs = (ed, pe)
    return out, correctable, errs


def golay_sliced_correct_planes(w, G: int, *, full_errors: bool = False):
    """Bit-sliced IMLD over plane words w: [24G, bs] int32 (plane-major).

    Returns (data_planes, correctable, errs):
      data_planes: [12G, bs] corrected data bit-planes (plane-major),
          uncorrectable codewords zeroed (fused-attention semantics,
          reference attention_ecc.py:257-259);
      correctable: [G, bs] mask, bit set iff the codeword was correctable;
      errs: (e_data [12G, bs], e_par [12G, bs]) raw error-bit planes (only
          if full_errors, for error-count statistics), else None.

    Differential-tested against golay_decode_i32 (the per-lane arithmetic
    decoder, itself tested against the syndrome-LUT oracle)."""
    d = [w[j * G : (j + 1) * G] for j in range(12)]
    p = [w[(12 + j) * G : (13 + j) * G] for j in range(12)]
    out, correctable, errs = golay_sliced_correct_plane_list(
        d, p, full_errors=full_errors
    )
    data = jnp.concatenate(out, axis=0)
    if full_errors:
        errs = (jnp.concatenate(errs[0], axis=0),
                jnp.concatenate(errs[1], axis=0))
    return data, correctable, errs


# -----------------------------------------------------------------------------
# Decode-side value unpack (multiply-spread; see module docstring)
# -----------------------------------------------------------------------------


def sliced_nibble_words(data, G: int):
    """Corrected data planes (list of 12 [G, bs], or [12G, bs] plane-major)
    -> 3 byte-interleaved nibble-word arrays [8G, bs] int32:
    pltpu.bitcast(B_t, int8) row r = nibble t of codeword row r (identity
    order). ~6 VPU ops per (nibble, bit) on 8G-row tiles - the whole unpack
    is ~24 ops/plane vs a 32-way bit transpose."""
    if not isinstance(data, (list, tuple)):
        data = [data[j * G : (j + 1) * G] for j in range(12)]
    rows = jax.lax.broadcasted_iota(jnp.int32, (8 * G, data[0].shape[1]), 0)
    sv = 4 * (rows // G)  # constant within each G-row block
    out = []
    for t in range(3):
        acc = None
        for b in range(4):
            plane = data[4 * t + b]
            rep = jnp.concatenate([plane] * 8, axis=0)  # row u -> plane[u % G]
            t4 = (rep >> sv) & 0xF  # bits of codewords 4u..4u+3
            spread = ((t4 * _SPREAD) & _M1) << b
            acc = spread if acc is None else acc | spread
        out.append(acc)
    return out


def sliced_error_count(e_data, e_par, correctable, valid_mask, G: int):
    """(corrected_bits, uncorrectable_events) int32 scalars from bit-sliced
    error planes (lists of 12 [G, bs], or [12G, bs] arrays). valid_mask:
    [G, bs] int32 (valid-token lanes x valid-row bits). Matches
    golay_decode_i32's accounting: corrected counts error BITS of
    correctable codewords; detected counts uncorrectable events."""
    pc = jax.lax.population_count
    if not isinstance(e_data, (list, tuple)):
        e_data = [e_data[j * G : (j + 1) * G] for j in range(12)]
    if not isinstance(e_par, (list, tuple)):
        e_par = [e_par[j * G : (j + 1) * G] for j in range(12)]
    corr = jnp.zeros((), jnp.int32)
    ok = correctable & valid_mask
    for j in range(12):
        corr = corr + jnp.sum(pc(e_data[j] & ok), dtype=jnp.int32)
        corr = corr + jnp.sum(pc(e_par[j] & ok), dtype=jnp.int32)
    det = jnp.sum(pc(~correctable & valid_mask), dtype=jnp.int32)
    return corr, det
