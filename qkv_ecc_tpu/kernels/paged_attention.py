"""Fused paged attention with inline ECC decode - the flagship Pallas kernel.

TPU-native redesign of the reference's fused Triton kernel
(kv_cache/attention_ecc.py:264 `paged_attention_ecc_kernel`). Decode-phase
attention (q_len == 1 per sequence): loads bit-packed ECC codeword words from
the paged HBM cache, decodes them inline with SWAR/bit-sliced arithmetic
(kernels/swar.py), dequantizes, and accumulates an online softmax - decoded
K/V are never materialized in HBM.

Key differences from the reference (deliberate, TPU-first):
  * Token-minor page layout [heads, words, block_size]: the minor dim of
    every HBM page slice is the 128-token block, so pages are DMA-able for
    ANY codec word count (Mosaic requires 128-lane-aligned minor dims), and
    the decoded page arrives as K^T [head_dim, tokens] - exactly the RHS
    layout the QK^T matmul wants.
  * SPLIT data/parity cache arrays (round 5, docs/split_parity_design.md):
    k_cache/v_cache hold ONLY the int4-packed data nibbles - byte-identical
    to the unprotected int4 cache - and the parity suffix lives in separate
    k_parity/v_parity arrays. Scrub-mode reads (the production default)
    take the data arrays alone: every page DMA is fully contiguous and the
    kernel is literally the int4 kernel modulo the nibble extract. The
    single-array layout's strided prefix-of-row DMAs (~0.08 ms per attended
    page) and the fused write's parity-row read-modify-write (~0.13
    ms/step) - both measured in round 4 - are gone. Correcting reads
    (always-decode / stats / interpolation) stream data + parity as two
    contiguous streams into adjacent VMEM rows and decode full rows.
  * BIT-PACKED storage + SWAR decode: int4 packs 8 values and hamming84 4
    codewords per int32 word, so one VPU op decodes 4-8 values (the
    reference decoded one codeword per thread-lane and stored one codeword
    per uint8, wasting bit 7; config.py:41-70). pltpu.bitcast's int32->int8
    sublane interleave turns the decoded byte-slot nibbles into head-dim-
    ordered K^T sublanes for free - no shift network, no sublane concat.
  * Grid = (batch, chunk) where one chunk is `pages_per_chunk` KV pages of
    ALL KV heads. The kernel hand-issues the HBM->VMEM page DMAs (block-table
    indirection on the scalar core) into a double-buffered VMEM scratch, so
    chunk c+1 streams in while chunk c is decoded and accumulated. A
    per-page Pallas BlockSpec pipeline was measured ~8x slower than manual
    chunked DMA (tiny tiles stall the DMA engine).
  * GQA is native: each chunk step attends all query heads against the
    shared pages.
  * Golay IS fused: the arithmetic IMLD decoder replaces the 4096-entry
    syndrome LUT, which is what kept Golay out of the reference's fused
    kernel (attention_ecc.py:759-775 falls back to Python). Codewords are
    byte-plane packed 4-per-3-words (8.0 bits/value) and rebuilt with three
    bitcasts; the decoded third-partitioned nibble planes stack straight
    into head-dim order.
  * int4 read-time injection (the reference's unprotected-arm fault model,
    unprotected_shim.py:276-302): fresh Bernoulli flips on the raw packed
    nibbles at every attend via a counter-hash PRNG - the cache stays
    clean, each step re-corrupts independently.
  * Online softmax state lives in VMEM scratch that persists across the
    sequential chunk dimension of the grid (flash-decoding style).
  * Optional in-kernel error counters (collect_stats=True): per-sequence
    corrected/detected counts matching the jnp decode path's accounting
    (reference get_ecc_stats, ecc_shim.py:1627-1642), masked to valid
    context tokens, accumulated in SMEM across chunks.

Supported codecs: int4 (unprotected), hamming74, hamming84, golay, plus the
float baseline arms fp16 (bf16 on TPU) and fp8 (no decode, no scales). Like
the reference's inline decoders, hamming84 PRESERVES double-error data
(attention_ecc.py:126-150) and golay ZEROES uncorrectable codewords
(attention_ecc.py:257-259).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codecs.algebra import GOLAY_B_ROW_MASKS
from . import common as C
from . import swar

_B_MASKS = tuple(int(m) for m in GOLAY_B_ROW_MASKS)
_NEG_INF = -1e30

ECC_CODECS = ("hamming74", "hamming84", "golay")


def _i32(x):
    return x.astype(jnp.int32)


def _nib_rows(w):
    """int4-packed words [Wd, bs] -> per-value nibble rows [8*Wd, bs]
    (identity order): split the byte's lo/hi nibble halves, then ONE int8
    bitcast expands byte slots to sublanes for free (swar.pack_int4)."""
    lo, hi = swar.int4_split(_i32(w))
    return _i32(pltpu.bitcast(jnp.concatenate([lo, hi], axis=0), jnp.int8))


def _golay_cw_tile(x, head_dim):
    """Full (data ++ parity) golay row tile [W, bs] -> 24-bit codeword tile
    [C4, bs] (swar.golay_split_pack layout). Correcting-path only - scrub
    reads never rebuild codewords."""
    W = x.shape[0]
    c4 = 4 * W // 3
    dw = swar.golay_data_nibbles(head_dim) // 8
    nib = _nib_rows(x[:dw])  # data values [0, 8*dw), identity
    ptail = _nib_rows(x[dw : W - c4 // 4])  # [plo (C4), padding values]
    plo, pads = ptail[:c4], ptail[c4:]
    thirds = jnp.concatenate([nib, pads], axis=0)  # [3C4, bs]
    d12 = (
        thirds[0:c4]
        | (thirds[2 * c4 : 3 * c4] << 4)
        | (thirds[c4 : 2 * c4] << 8)
    )
    phi = _i32(pltpu.bitcast(x[W - c4 // 4 :], jnp.int8)) & 0xFF  # [C4, bs]
    return d12 | (plo << 12) | (phi << 16)


def _decode_kt_tile(codec, raw, head_dim, op_t, *, minus8):
    """Decode one packed FULL-row page tile [W, bs] (data ++ parity) -> ONE
    K^T value tile [head_dim, bs] in op_t, head-dim order (packing padding
    sliced off). Nibbles optionally shifted by the -8 zero point (exact in
    bf16).

    Every codec's value mapping is chosen so the decoded tile is IDENTITY-
    ordered over the head dim - the query needs no permutation and the
    QK^T/PV contractions are single head_dim-deep MXU passes."""
    z = 8 if minus8 else 0

    def fin(t):  # int8/int32 nibble tile -> op_t, sliced to head_dim
        return (_i32(t[:head_dim]) - z).astype(op_t)

    x = _i32(raw)
    if codec == "int4":
        lo, hi = swar.int4_split(x)
        # [lo; hi] int8 view = identity value order over [0, D)
        return fin(pltpu.bitcast(jnp.concatenate([lo, hi], axis=0), jnp.int8))
    if codec == "hamming84":
        half = x.shape[0] // 2
        lo, hi = swar.h84_rebuild_cw_words(x[:half], x[half:])
        dec = jnp.concatenate(
            [swar.h84_swar_correct_data(lo), swar.h84_swar_correct_data(hi)],
            axis=0,
        )
        return fin(pltpu.bitcast(dec, jnp.int8))
    if codec == "hamming74":
        dw = swar.data_words(codec, head_dim)
        G = (x.shape[0] - dw) // 3
        lo, hi = swar.int4_split(x[:dw])
        d = _i32(pltpu.bitcast(jnp.concatenate([lo, hi], axis=0), jnp.int8))
        p0, p1, p2 = (
            swar.h74_plane_bits(x[dw + p * G : dw + (p + 1) * G], G)
            for p in range(3)
        )
        dec, _ = swar.h74_value_correct(d, p0, p1, p2)
        return fin(dec)
    if codec == "golay":
        cw = _golay_cw_tile(x, head_dim)
        d12 = C.golay_correct_data_i32(cw, _B_MASKS)  # [C4, bs]
        # third-partitioned nibble planes stack along sublanes into
        # head-dim order (swar.golay_pack_thirds: thirds 0/1/2 live in
        # bits 0-3 / 8-11 / 4-7)
        planes = jnp.concatenate(
            [d12 & 0xF, (d12 >> 8) & 0xF, (d12 >> 4) & 0xF], axis=0
        )
        return fin(planes)
    raise ValueError(f"fused kernel does not support codec '{codec}'")


def _extract_kt_tile(codec, raw, head_dim, op_t, *, minus8):
    """Clean-page fast path: unpack WITHOUT correction (scrub mode).

    After write-path scrubbing every stored codeword is valid, and the
    split data/parity layout means the kernel only DMA'd the int4-packed
    DATA arrays - so every ECC codec's read path IS the unprotected-int4
    read path: same bytes streamed, same nibble split, zero correction
    network. Parity stayed in HBM, untouched. This is what makes ECC
    'patrol scrubbing' (DRAM-controller style) pay: correct once at write,
    verify-free reads."""
    z = 8 if minus8 else 0

    def fin(t):
        return (_i32(t[:head_dim]) - z).astype(op_t)

    dw = swar.data_words(codec, head_dim)
    x = _i32(raw)[:dw]
    if codec in ("int4", "hamming74", "hamming84", "golay"):
        # every codec's data array is the int4 packing (round-5 h74
        # re-layout included): ONE nibble split + bitcast, zero decode
        lo, hi = swar.int4_split(x)
        return fin(pltpu.bitcast(jnp.concatenate([lo, hi], axis=0), jnp.int8))
    raise ValueError(f"scrub fast path does not support codec '{codec}'")


def _count_errors(codec, raw, valid_lanes, head_dim):
    """(corrected, detected) scalars for one packed full-row page tile
    [W, bs], masked to valid context tokens (valid_lanes: [1, bs] int32
    0/1).

    Matches the jnp decode path's accounting: hamming74 counts nonzero
    syndromes as corrected; hamming84 counts singles/doubles; golay counts
    corrected BITS (error_count 1-3) and uncorrectable events."""
    pc = jax.lax.population_count
    x = _i32(raw)
    zero = jnp.zeros((), jnp.int32)
    if codec == "int4":
        return zero, zero
    if codec == "hamming84":
        half = x.shape[0] // 2
        corrected = detected = zero
        for piece in swar.h84_rebuild_cw_words(x[:half], x[half:]):
            _, single, double = swar.h84_swar_decode(piece)
            corrected = corrected + jnp.sum(
                pc(single * valid_lanes), dtype=jnp.int32
            )
            detected = detected + jnp.sum(
                pc(double * valid_lanes), dtype=jnp.int32
            )
        return corrected, detected
    if codec == "hamming74":
        dw = swar.data_words(codec, head_dim)
        G = (x.shape[0] - dw) // 3
        lo, hi = swar.int4_split(x[:dw])
        d = _i32(pltpu.bitcast(jnp.concatenate([lo, hi], axis=0), jnp.int8))
        p0, p1, p2 = (
            swar.h74_plane_bits(x[dw + p * G : dw + (p + 1) * G], G)
            for p in range(3)
        )
        _, err = swar.h74_value_correct(d, p0, p1, p2)
        corrected = jnp.sum(err * valid_lanes, dtype=jnp.int32)
        return corrected, zero
    if codec == "golay":
        cw = _golay_cw_tile(x, head_dim)
        _, cnt = C.golay_decode_i32(cw, _B_MASKS, zero_uncorrectable=True)
        cnt = cnt * valid_lanes
        corrected = jnp.sum(jnp.where(cnt < 4, cnt, 0), dtype=jnp.int32)
        detected = jnp.sum((cnt == 4).astype(jnp.int32), dtype=jnp.int32)
        return corrected, detected
    return zero, zero


class _ChunkCopy:
    """Async HBM->VMEM copy of one chunk (pages_per_chunk pages, all KV
    heads, every streamed array) through a shared DMA semaphore. Mirrors
    the JAX paged_attention MultiPageAsyncCopyDescriptor pattern:
    descriptors are reconstructed identically at issue and wait sites.

    Every copy is a FULL page of its array - `hbm[layer, phys] ->
    buf[slot, i]` - with no word-axis slicing: the split data/parity layout
    makes each array's pages contiguous, so the DMA engine streams maximal
    runs (the single-array layout's prefix-of-row copies were strided ~8 KB
    runs with ~8 KB holes, measured ~0.08 ms/page of overhead)."""

    def __init__(self, pairs, sem, block_tables_ref, b, layer, chunk,
                 pages_per_chunk, max_pages, slot):
        self._copies = []
        for i in range(pages_per_chunk):
            pidx = jnp.minimum(chunk * pages_per_chunk + i, max_pages - 1)
            phys = jnp.maximum(block_tables_ref[b, pidx], 0)
            for hbm, buf in pairs:
                self._copies.append(
                    pltpu.make_async_copy(
                        hbm.at[layer, phys], buf.at[slot, i], sem
                    )
                )

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _paged_attn_kernel(
    # scalar prefetch
    layer_ref,
    block_tables_ref,
    context_lens_ref,
    # VMEM/HBM inputs + outputs + scratch (layout depends on flags)
    *refs,
    codec: str,
    block_size: int,
    head_dim: int,
    sm_scale: float,
    pages_per_chunk: int,
    num_chunks: int,
    max_pages: int,
    num_kv_heads: int,
    group: int,
    precision: str,
    fused_write: bool,
    has_parity: bool,
    interpolate: bool,
    collect_stats: bool,
    read_inject_threshold: int | None,
    sliding_window: int | None,
    scrub: bool = False,
    return_softmax_state: bool = False,
):
    refs = list(refs)
    is_float_codec = codec in ("fp16", "fp8")
    with_scales = not is_float_codec
    if fused_write:
        q_ref, kn_ref, vn_ref, ksn_ref, vsn_ref = refs[:5]
        del refs[:5]
    else:
        q_ref = refs.pop(0)
    k_hbm = refs.pop(0)
    v_hbm = refs.pop(0)
    kp_hbm = refs.pop(0) if has_parity else None
    vp_hbm = refs.pop(0) if has_parity else None
    ks_hbm = refs.pop(0)
    vs_hbm = refs.pop(0)
    out_ref = refs.pop(0)
    if fused_write:
        ko_ref = refs.pop(0)
        vo_ref = refs.pop(0)
        kpo_ref = refs.pop(0) if has_parity else None
        vpo_ref = refs.pop(0) if has_parity else None
        kso_ref = refs.pop(0)
        vso_ref = refs.pop(0)
    if return_softmax_state:
        m_out_ref = refs.pop(0)
        l_out_ref = refs.pop(0)
    stats_ref = refs.pop(0) if collect_stats else None
    k_buf = refs.pop(0)
    v_buf = refs.pop(0)
    kp_buf = refs.pop(0) if has_parity else None
    vp_buf = refs.pop(0) if has_parity else None
    ks_buf = refs.pop(0)
    vs_buf = refs.pop(0)
    sem = refs.pop(0)
    wsem = refs.pop(0) if fused_write else None
    m_scr = refs.pop(0)
    l_scr = refs.pop(0)
    acc_scr = refs.pop(0)
    # persists across the sequential chunk grid dim: the PRE-interpolation
    # decoded last column of each chunk, so the next chunk's first token
    # has its true left temporal neighbor (chunk-seam exactness)
    edge_scr = (
        refs.pop(0) if (interpolate and codec == "hamming84") else None
    )

    b = pl.program_id(0)
    c = pl.program_id(1)
    layer = layer_ref[0]
    rseed = layer_ref[1]
    ctx = context_lens_ref[b]
    bs = block_size
    tokens_per_chunk = pages_per_chunk * bs
    data_w = k_buf.shape[3]

    def _read_flip_mask(i, h, t, shape):
        """Fresh Bernoulli flips on the raw packed nibbles at read time
        (the reference's unprotected-arm fault model,
        unprotected_shim.py:276-302). Deterministic per
        (step-seed, layer, seq, chunk, page, head, tensor)."""
        uid = ((((layer * pl.num_programs(0) + b) * num_chunks + c)
                * pages_per_chunk + i) * num_kv_heads + h) * 2 + t
        base = uid * jnp.int32(data_w * bs)
        return swar.hash_flip_mask(
            rseed, base, shape, read_inject_threshold
        )

    def chunk_copy(chunk, slot):
        pairs = [(k_hbm, k_buf), (v_hbm, v_buf)]
        if has_parity:
            pairs += [(kp_hbm, kp_buf), (vp_hbm, vp_buf)]
        if with_scales:
            pairs += [(ks_hbm, ks_buf), (vs_hbm, vs_buf)]
        return _ChunkCopy(
            pairs, sem, block_tables_ref, b, layer, chunk,
            pages_per_chunk, max_pages, slot,
        )

    @pl.when(c == 0)
    def _warmup():
        # an empty row (ctx == 0) never processes chunk 0, so starting its
        # DMAs would leave unconsumed signals on the shared semaphore and
        # corrupt every later row's waits
        @pl.when(ctx > 0)
        def _prefetch_first():
            chunk_copy(0, 0).start()

        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if collect_stats:
            stats_ref[0] = 0
            stats_ref[1] = 0

    @pl.when(((c + 1) < num_chunks) & ((c + 1) * tokens_per_chunk < ctx))
    def _issue_next():
        chunk_copy(c + 1, (c + 1) % 2).start()

    exact = precision == "highest"
    op_t = jnp.float32 if exact else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT

    # fused-write bookkeeping, shared by the overlay/wait stages below
    if fused_write:
        tok_idx = ctx - 1
        tok_page = tok_idx // bs
        tok_lane = tok_idx % bs
        i_in_chunk = tok_page - c * pages_per_chunk
        write_here = (
            (tok_page >= c * pages_per_chunk)
            & (tok_page < (c + 1) * pages_per_chunk)
            & (tok_page < max_pages)
        )

        def _wb_copies(i, slot):
            """Write-back copies of the token's (overlaid) page: every
            streamed array's page goes back whole - data, parity (when
            streamed), scales. Full contiguous pages, no RMW staging (the
            split layout's parity pages are self-contained)."""
            phys = jnp.maximum(block_tables_ref[b, tok_page], 0)
            wb_pairs = [(k_buf, ko_ref), (v_buf, vo_ref)]
            if has_parity:
                wb_pairs += [(kp_buf, kpo_ref), (vp_buf, vpo_ref)]
            if with_scales:
                wb_pairs += [(ks_buf, kso_ref), (vs_buf, vso_ref)]
            return [
                pltpu.make_async_copy(
                    buf.at[slot, i], out.at[layer, phys], wsem
                )
                for buf, out in wb_pairs
            ]

    @pl.when(c * tokens_per_chunk < ctx)
    def _process():
        slot = c % 2
        chunk_copy(c, slot).wait()

        if fused_write:
            # Overlay the new token's packed codeword column into the page we
            # just staged in VMEM, then DMA the whole page back to the
            # (aliased) HBM cache. The caches are thus ONLY ever touched by
            # this kernel during decode - XLA never copies them (a scatter-
            # then-custom-call chain made XLA materialize a full cache copy
            # per layer, ~6x the whole step's useful HBM traffic). The
            # write-back DMAs are started here but WAITED only after the
            # chunk's attends (the buffers are not mutated again), hiding
            # their latency under compute.
            @pl.when(write_here)
            def _write_token():
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
                is_tok = lane == tok_lane  # [1, bs]
                for i in range(pages_per_chunk):

                    @pl.when(i_in_chunk == i)
                    def _overlay():
                        # kn_ref[h] is a native [W, 1] column (data-only in
                        # scrub mode, data ++ parity when parity streams).
                        # Mosaic broadcast-selects want 32-bit operands: int
                        # codecs store int32 natively; float codecs
                        # roundtrip through f32 (exact for bf16/fp8).
                        rt = jnp.float32 if is_float_codec else jnp.int32
                        for h in range(num_kv_heads):
                            k_buf[slot, i, h] = jnp.where(
                                is_tok,
                                kn_ref[h, :data_w].astype(rt),
                                k_buf[slot, i, h].astype(rt),
                            ).astype(k_buf.dtype)
                            v_buf[slot, i, h] = jnp.where(
                                is_tok,
                                vn_ref[h, :data_w].astype(rt),
                                v_buf[slot, i, h].astype(rt),
                            ).astype(v_buf.dtype)
                            if has_parity:
                                kp_buf[slot, i, h] = jnp.where(
                                    is_tok,
                                    _i32(kn_ref[h, data_w:]),
                                    _i32(kp_buf[slot, i, h]),
                                ).astype(kp_buf.dtype)
                                vp_buf[slot, i, h] = jnp.where(
                                    is_tok,
                                    _i32(vn_ref[h, data_w:]),
                                    _i32(vp_buf[slot, i, h]),
                                ).astype(vp_buf.dtype)
                        if with_scales:
                            # float codecs carry no scales (their scale
                            # pages are never DMA'd in, so writing the
                            # scratch back would store garbage)
                            ks_buf[slot, i] = jnp.where(
                                is_tok, ksn_ref[0][:, None], ks_buf[slot, i]
                            )
                            vs_buf[slot, i] = jnp.where(
                                is_tok, vsn_ref[0][:, None], vs_buf[slot, i]
                            )
                        for w in _wb_copies(i, slot):
                            w.start()

        do_interp = interpolate and codec == "hamming84"

        def row_tile(buf, pbuf, i, h):
            """One (page, head) packed row tile: the data page rows, with
            the parity page rows appended when parity streams (the concat
            boundary data_w is sublane-aligned at production head dims)."""
            x = buf[slot, i, h]
            if pbuf is not None:
                return jnp.concatenate([_i32(x), _i32(pbuf[slot, i, h])],
                                       axis=0)
            return x

        def interp_pages(pages_dec, pages_et, chunk_base, prev_edge_col):
            """SECDED double-error temporal interpolation across the chunk's
            consecutive pages: v_hat[t] = floor((v[t-1]+v[t+1])/2 + 0.5) at
            DOUBLE_DETECTED positions (oracle: codecs/interpolation.py).
            Neighbors cross page boundaries inside the chunk AND across
            chunks on the left (prev_edge_col = previous chunk's last
            pre-interpolation column, carried in VMEM scratch). The only
            remaining approximation: a double error in the LAST token of a
            non-final chunk clamps its right neighbor to itself (the true
            right neighbor lives in the not-yet-decoded next chunk). The
            reference's fused kernel skipped interpolation entirely
            (ecc_shim.py:791-799)."""
            out = []
            for i, (x, et) in enumerate(zip(pages_dec, pages_et)):
                if i > 0:
                    lcol = pages_dec[i - 1][:, -1:]
                else:
                    # first page of the chunk: previous chunk's edge column
                    # (self-clamp only for the very first chunk)
                    lcol = jnp.where(c > 0, prev_edge_col, x[:, :1])
                rcol = (
                    pages_dec[i + 1][:, :1]
                    if i + 1 < len(pages_dec)
                    else x[:, -1:]
                )
                left = jnp.concatenate([lcol, x[:, :-1]], axis=1)
                right = jnp.concatenate([x[:, 1:], rcol], axis=1)
                tok = chunk_base + i * bs + jax.lax.broadcasted_iota(
                    jnp.int32, x.shape, dimension=1
                )
                # clamp at the sequence's true end (right neighbor of the
                # last valid token is itself) and at position 0
                right = jnp.where(tok + 1 < ctx, right, x)
                left = jnp.where(tok == 0, x, left)
                interp = (left + right + 1) >> 1
                out.append(jnp.where(et, interp, x))
            return out

        if collect_stats and not is_float_codec:
            corr_acc = jnp.zeros((), jnp.int32)
            det_acc = jnp.zeros((), jnp.int32)
            for h in range(num_kv_heads):
                for i in range(pages_per_chunk):
                    page_start = (c * pages_per_chunk + i) * bs
                    lane = page_start + jax.lax.broadcasted_iota(
                        jnp.int32, (1, bs), 1
                    )
                    valid = (lane < ctx).astype(jnp.int32)
                    for t, (buf, pbuf) in enumerate(
                        ((k_buf, kp_buf), (v_buf, vp_buf))
                    ):
                        if read_inject_threshold is not None:
                            # int4 read-inject: stats[0] counts flipped
                            # READ bits over the valid context (the
                            # reference's actual_ber numerator,
                            # unprotected_shim.py:555-574)
                            m = _read_flip_mask(
                                i, h, t, buf[slot, i, h].shape
                            )
                            corr_acc = corr_acc + jnp.sum(
                                jax.lax.population_count(m * valid),
                                dtype=jnp.int32,
                            )
                        else:
                            cr, dt = _count_errors(
                                codec, row_tile(buf, pbuf, i, h), valid,
                                head_dim,
                            )
                            corr_acc = corr_acc + cr
                            det_acc = det_acc + dt
            stats_ref[0] += corr_acc
            stats_ref[1] += det_acc

        def attend(h, i, kt, vt):
            """One (kv-head, in-chunk page) online-softmax accumulation.

            Nibbles (0..15 minus zero point) are EXACT in bf16, so the
            fast path runs both matmuls on bf16 operands (1 MXU pass vs 6
            for f32 HIGHEST) and folds the per-token dequant scales in
            AFTER the QK^T dot / BEFORE the PV dot, where they touch
            [group, bs] score tiles instead of [head_dim, bs] pages.
            Float codecs (fp16/fp8 baseline arms) skip decode and scales."""
            page_start = (c * pages_per_chunk + i) * bs
            q = q_ref[h].astype(op_t)  # [group, L_s] (storage-lane order)
            r0, r1 = h * group, (h + 1) * group
            if not is_float_codec:
                ks = ks_buf[slot, i, h].astype(jnp.float32)  # [bs]
                vs = vs_buf[slot, i, h].astype(jnp.float32)

            s_raw = jax.lax.dot_general(
                q,
                kt,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # [group, bs]
            if is_float_codec:
                s = s_raw * sm_scale
            else:
                s = s_raw * (ks * sm_scale)[None, :]
            token_ids = page_start + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1
            )
            live = token_ids < ctx
            if sliding_window is not None:
                # decode query position is ctx-1: attend to the last
                # `sliding_window` tokens only (HF Mistral semantics)
                live = live & (token_ids >= ctx - sliding_window)
            s = jnp.where(live, s, _NEG_INF)

            m_prev = m_scr[r0:r1, :1]  # [group, 1]
            l_prev = l_scr[r0:r1, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p_ij = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p_ij, axis=1, keepdims=True)
            # fold the V dequant scale into the softmax weights, then
            # contract tokens: p [group, bs] x vt [L_s, bs] -> [group,
            # L_s]. The -8 zero point becomes a rank-1 correction.
            pv = p_ij if is_float_codec else p_ij * vs[None, :]
            pv = pv.astype(op_t)
            delta = jax.lax.dot_general(
                pv,
                vt,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            if not is_float_codec:
                delta = delta - 8.0 * jnp.sum(
                    pv.astype(jnp.float32), axis=1, keepdims=True
                )
            acc_scr[r0:r1] = acc_scr[r0:r1] * alpha + delta
            m_scr[r0:r1] = jnp.broadcast_to(m_new, (group, m_scr.shape[1]))
            l_scr[r0:r1] = jnp.broadcast_to(l_new, (group, l_scr.shape[1]))

        def _wb_wait():
            """Consume the deferred write-back DMAs issued by _overlay
            (descriptors reconstructed identically; the staged buffers are
            not mutated between start and wait)."""
            if not fused_write:
                return

            @pl.when(write_here)
            def _wait_writes():
                for i in range(pages_per_chunk):

                    @pl.when(i_in_chunk == i)
                    def _w():
                        for w in _wb_copies(i, slot):
                            w.wait()

        if scrub:
            # Write-path-scrubbed cache: every stored codeword is valid
            # (corrections were applied and re-encoded at WRITE time, see
            # swar.scrub_codewords), so decode degenerates to unconditional
            # data-bit extraction - no per-page branches, no correction
            # network, no parity traffic at all (the parity arrays are not
            # even kernel operands; the new token's parity column is
            # scattered outside the kernel, models/runtime.py).
            for i in range(pages_per_chunk):
                for h in range(num_kv_heads):
                    kt = _extract_kt_tile(
                        codec, k_buf[slot, i, h], head_dim, op_t,
                        minus8=True,
                    )
                    vt = _extract_kt_tile(
                        codec, v_buf[slot, i, h], head_dim, op_t,
                        minus8=False,
                    )
                    attend(h, i, kt, vt)
            _wb_wait()
            return

        for h in range(num_kv_heads):
            if do_interp:
                # decode the whole chunk first: interpolation needs
                # cross-page temporal neighbors. SWAR-decode to per-value
                # int32 tiles via bitcast; doubles masks expand the same way.
                kd, ket, vd, vet = [], [], [], []
                for i in range(pages_per_chunk):
                    for (buf, pbuf), dl, el in (
                        ((k_buf, kp_buf), kd, ket),
                        ((v_buf, vp_buf), vd, vet),
                    ):
                        # split rows: rebuild byte-slot codeword words
                        # (lo = values [0, pv/2), hi = the rest), so the
                        # [lo; hi] bitcast is identity-ordered like
                        # _decode_kt_tile's hamming84 path
                        x = _i32(row_tile(buf, pbuf, i, h))
                        half = x.shape[0] // 2
                        decs, dbls = [], []
                        for piece in swar.h84_rebuild_cw_words(
                            x[:half], x[half:]
                        ):
                            dec, _, double = swar.h84_swar_decode(piece)
                            decs.append(dec)
                            dbls.append(double * 0xFF)
                        dl.append(_i32(pltpu.bitcast(
                            jnp.concatenate(decs, axis=0), jnp.int8)))
                        el.append(_i32(pltpu.bitcast(
                            jnp.concatenate(dbls, axis=0), jnp.int8)) != 0)
                chunk_base = c * pages_per_chunk * bs
                k_edge_prev = edge_scr[0, h][:, 0:1]
                v_edge_prev = edge_scr[1, h][:, 0:1]
                k_last = kd[-1][:, -1:]
                v_last = vd[-1][:, -1:]
                kd = interp_pages(kd, ket, chunk_base, k_edge_prev)
                vd = interp_pages(vd, vet, chunk_base, v_edge_prev)
                # store this chunk's PRE-interp last column for chunk c+1
                edge_scr[0, h] = jnp.broadcast_to(k_last, edge_scr.shape[2:])
                edge_scr[1, h] = jnp.broadcast_to(v_last, edge_scr.shape[2:])
            for i in range(pages_per_chunk):
                if is_float_codec:
                    kt = k_buf[slot, i, h].astype(op_t)  # [D, bs]
                    vt = v_buf[slot, i, h].astype(op_t)
                elif do_interp:
                    kt = (kd[i][:head_dim] - 8).astype(op_t)
                    vt = vd[i][:head_dim].astype(op_t)
                else:
                    kt_raw = row_tile(k_buf, kp_buf, i, h)
                    vt_raw = row_tile(v_buf, vp_buf, i, h)
                    if read_inject_threshold is not None:
                        # corrupt the read VALUES only - the cache (and the
                        # fused write-back above) stays clean, so the same
                        # token is re-corrupted independently every step
                        kt_raw = kt_raw ^ _read_flip_mask(i, h, 0, kt_raw.shape)
                        vt_raw = vt_raw ^ _read_flip_mask(i, h, 1, vt_raw.shape)
                    kt = _decode_kt_tile(
                        codec, kt_raw, head_dim, op_t, minus8=True
                    )  # [head_dim, bs]
                    vt = _decode_kt_tile(
                        codec, vt_raw, head_dim, op_t, minus8=False
                    )
                attend(h, i, kt, vt)
        _wb_wait()

    @pl.when(c == num_chunks - 1)
    def _finalize():
        if return_softmax_state:
            # context-parallel decode: emit the UNNORMALIZED online-softmax
            # state; the caller merges shards via a log-sum-exp-weighted
            # psum (parallel/context_parallel.py)
            out_ref[:] = acc_scr[:].reshape(out_ref.shape).astype(out_ref.dtype)
            m_out_ref[:] = m_scr[:].reshape(m_out_ref.shape)
            l_out_ref[:] = l_scr[:].reshape(l_out_ref.shape)
        else:
            l_fin = l_scr[:, :1]
            safe_l = jnp.where(l_fin > 0, l_fin, 1.0)
            out = jnp.where(l_fin > 0, acc_scr[:] / safe_l, 0.0)
            out_ref[:] = out.reshape(out_ref.shape).astype(out_ref.dtype)


def _check_scrub_flags(scrub, codec, use_interpolation, collect_stats,
                       read_inject_ber):
    """Scrub mode streams/decodes only the data arrays, so every feature
    that must SEE parity bits (or raw-bit corruption) is rejected."""
    if not scrub:
        return
    if codec not in ("int4", "hamming74", "hamming84", "golay"):
        raise ValueError(f"scrub requires a packed-int codec, got '{codec}'")
    if use_interpolation:
        raise ValueError(
            "scrub + interpolation is unsupported: scrubbing re-encodes "
            "double-error data as valid codewords, which would erase "
            "the doubles mask interpolation keys on"
        )
    if collect_stats:
        raise ValueError(
            "collect_stats counts corrections per READ (reference "
            "get_ecc_stats semantics); disable scrub to collect them"
        )
    if read_inject_ber:
        raise ValueError(
            "read-time injection corrupts raw packed bits per attend; the "
            "scrub fast path would not decode them - disable scrub"
        )


def _read_threshold(read_inject_ber: float, codec: str):
    """Static uint32 Bernoulli threshold for read-time injection, or None."""
    if not read_inject_ber or read_inject_ber <= 0:
        return None
    if codec != "int4":
        raise ValueError(
            "read-time injection is only defined for the unprotected int4 "
            "arm (reference unprotected_shim.py:276)"
        )
    return min(int(float(read_inject_ber) * (2.0**32)), 0xFFFFFFFF)


def _resolve_parity(codec, head_dim, scrub, k_parity, v_parity):
    """Decide the read-path shape: (extract, has_parity, parity operands).

    extract: the scrub extract-only fast path (data arrays alone). int4
    takes it too when scrub is set - extraction IS its decode, and the
    extract branch's page-outer/head-inner loop order measures ~0.4
    ms/step faster at bench shapes than the general decode loop's
    head-outer order (v5e, round 5: 4.22 vs 4.66 ms/step).
    has_parity: the kernel streams the parity arrays (correcting reads).
    With scrub + extract_ok the parity operands are IGNORED (reads never
    touch parity); otherwise a parity-bearing codec REQUIRES them."""
    if codec not in ECC_CODECS or swar.parity_words(codec, head_dim) == 0:
        return scrub and codec == "int4", False, None, None
    extract = scrub and swar.scrub_extract_ok(codec, head_dim)
    if extract:
        return True, False, None, None
    if k_parity is None or v_parity is None:
        raise ValueError(
            f"codec '{codec}' needs k_parity/v_parity operands for "
            "correcting reads (split cache layout); only the scrub "
            "extract path runs without them"
        )
    return False, True, k_parity, v_parity


@functools.partial(
    jax.jit,
    static_argnames=("codec", "block_size", "num_pages", "sm_scale",
                     "pages_per_chunk", "precision", "use_interpolation",
                     "collect_stats", "read_inject_ber", "sliding_window",
                     "return_softmax_state", "scrub"),
)
def paged_attention_ecc(
    query,
    k_cache,
    v_cache,
    k_scales,
    v_scales,
    block_table,
    context_lens,
    layer_idx,
    k_parity=None,
    v_parity=None,
    *,
    codec: str = "hamming84",
    block_size: int = 128,
    num_pages: int | None = None,
    sm_scale: float | None = None,
    pages_per_chunk: int | None = None,
    precision: str = "fast",
    use_interpolation: bool = False,
    collect_stats: bool = False,
    read_inject_ber: float = 0.0,
    read_inject_seed=0,
    sliding_window: int | None = None,
    return_softmax_state: bool = False,
    scrub: bool = False,
):
    """Decode-phase fused paged attention with inline ECC decode.

    Args:
        query: [batch, num_q_heads, head_dim] (one decode token per sequence).
        k_cache/v_cache: [num_layers, num_blocks, num_kv_heads, data_words,
            block_size] - token-minor bit-packed DATA pages (int32 for the
            integer codecs; see kernels/swar.py for the packings).
        k_parity/v_parity: [num_layers, num_blocks, num_kv_heads,
            parity_words, block_size] parity pages (split layout). Required
            for correcting reads of the ECC codecs; ignored in scrub mode
            (reads never touch parity); None for int4/fp16/fp8.
        k_scales/v_scales: [num_layers, num_blocks, num_kv_heads, block_size].
        block_table: int32 [batch, max_blocks] (-1 for unallocated).
        context_lens: int32 [batch].
        layer_idx: which layer of the stacked cache to attend over.
        codec: int4 | hamming74 | hamming84 | golay | fp16 | fp8.
        num_pages: static page-loop bound (default: block_table.shape[1]).
        pages_per_chunk: KV pages DMA'd per grid step (default: ~512 tokens).
        precision: "fast" = bf16 matmul operands (nibbles are exact; only
            the query and softmax weights round, ~2^-8 relative), "highest"
            = 6-pass f32 for bit-for-bit verification runs.
        collect_stats: also return int32 [batch, 2] (corrected, detected)
            error counts over the attended context (reference get_ecc_stats
            semantics).

    Returns:
        [batch, num_q_heads, head_dim] attention output (query dtype), or
        (output, stats) with collect_stats.

    On real TPUs block_size must be a multiple of 128 (the HBM page slice's
    minor dim must be lane-aligned); the CPU interpreter accepts any size.
    """
    (batch, num_q_heads, head_dim, num_kv_heads, data_w, group, num_pages,
     sm_scale, cp, num_chunks) = _common_setup(
        query, k_cache, block_size, codec, num_pages, block_table, sm_scale,
        pages_per_chunk)
    _check_scrub_flags(scrub, codec, use_interpolation, collect_stats,
                       read_inject_ber)
    extract, has_parity, k_parity, v_parity = _resolve_parity(
        codec, head_dim, scrub, k_parity, v_parity
    )
    pw = k_parity.shape[3] if has_parity else 0

    q4 = query.reshape(batch, num_kv_heads, group, head_dim)

    def q_map(b, c, layer, bt, cl):
        return (b, 0, 0, 0)

    def stats_map(b, c, layer, bt, cl):
        return (b, 0)

    def ml_map(b, c, layer, bt, cl):
        return (b, 0, 0)

    out_dtype = jnp.float32 if return_softmax_state else query.dtype
    out_specs = [
        pl.BlockSpec((None, num_kv_heads, group, head_dim), q_map,
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct(q4.shape, out_dtype)]
    if return_softmax_state:
        for _ in range(2):  # running max m and normalizer l, [b, Hq, 128]
            out_specs.append(
                pl.BlockSpec((None, num_q_heads, 128), ml_map,
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct((batch, num_q_heads, 128), jnp.float32)
            )
    if collect_stats:
        out_specs.append(
            pl.BlockSpec((None, 2), stats_map, memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((batch, 2), jnp.int32))

    n_hbm_in = 4 + (2 if has_parity else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_chunks),
        in_specs=[
            pl.BlockSpec((None, num_kv_heads, group, head_dim), q_map,
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n_hbm_in)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, cp, num_kv_heads, data_w, block_size),
                       k_cache.dtype),
            pltpu.VMEM((2, cp, num_kv_heads, data_w, block_size),
                       v_cache.dtype),
        ]
        + (
            [
                pltpu.VMEM((2, cp, num_kv_heads, pw, block_size),
                           k_parity.dtype),
                pltpu.VMEM((2, cp, num_kv_heads, pw, block_size),
                           v_parity.dtype),
            ]
            if has_parity
            else []
        )
        + [
            pltpu.VMEM((2, cp, num_kv_heads, block_size), k_scales.dtype),
            pltpu.VMEM((2, cp, num_kv_heads, block_size), v_scales.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((num_q_heads, 128), jnp.float32),
            pltpu.VMEM((num_q_heads, 128), jnp.float32),
            pltpu.VMEM((num_q_heads, head_dim), jnp.float32),
        ]
        + (
            # cross-chunk interpolation edge columns (see _paged_attn_kernel)
            [pltpu.VMEM((2, num_kv_heads, 4 * (data_w + pw), 128), jnp.int32)]
            if use_interpolation and codec == "hamming84"
            else []
        ),
    )

    kernel = functools.partial(
        _paged_attn_kernel,
        codec=codec,
        block_size=block_size,
        head_dim=head_dim,
        sm_scale=sm_scale,
        pages_per_chunk=cp,
        num_chunks=num_chunks,
        max_pages=num_pages,
        num_kv_heads=num_kv_heads,
        group=group,
        precision=precision,
        fused_write=False,
        has_parity=has_parity,
        interpolate=use_interpolation,
        collect_stats=collect_stats,
        read_inject_threshold=_read_threshold(read_inject_ber, codec),
        sliding_window=sliding_window,
        return_softmax_state=return_softmax_state,
        scrub=extract,
    )

    operands = [q4, k_cache, v_cache]
    if has_parity:
        operands += [k_parity, v_parity]
    operands += [k_scales, v_scales]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=C.use_interpret(),
    )(
        jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                   jnp.asarray(read_inject_seed, jnp.int32)]),
        block_table.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        *operands,
    )
    out = outs[0].reshape(batch, num_q_heads, head_dim)
    rest = list(outs[1:])
    if return_softmax_state:
        m = rest.pop(0)[..., 0]  # [b, Hq]
        l = rest.pop(0)[..., 0]
        out = (out, m, l)
    if collect_stats:
        return out, rest.pop(0)
    return out


def _common_setup(query, k_cache, block_size, codec, num_pages, block_table,
                  sm_scale, pages_per_chunk):
    batch, num_q_heads, head_dim = query.shape
    _, num_blocks, num_kv_heads, data_w, bs = k_cache.shape
    assert bs == block_size, (bs, block_size)
    group = num_q_heads // num_kv_heads
    assert group * num_kv_heads == num_q_heads
    if not C.use_interpret() and block_size % 128 != 0:
        raise ValueError(
            f"TPU paged attention requires block_size % 128 == 0, got "
            f"{block_size} (token-minor pages must be lane-aligned)"
        )
    if num_pages is None:
        num_pages = block_table.shape[1]
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5
    if pages_per_chunk is None:
        # 512-token chunks: at pages_per_chunk=2 the double-buffered DMA
        # pipeline drained between chunk waits and the marginal paged-KV
        # stream sat at ~320 GB/s (39% of the v5e pin rate) even fully
        # contiguous; VMEM has ~60x headroom (RESULTS.md round-4 roofline)
        pages_per_chunk = max(1, 512 // block_size)
    cp = min(pages_per_chunk, num_pages)
    num_chunks = C.cdiv(num_pages, cp)
    return (batch, num_q_heads, head_dim, num_kv_heads, data_w, group,
            num_pages, float(sm_scale), cp, num_chunks)


@functools.partial(
    jax.jit,
    static_argnames=("codec", "block_size", "num_pages", "sm_scale",
                     "pages_per_chunk", "precision", "use_interpolation",
                     "collect_stats", "read_inject_ber", "sliding_window",
                     "scrub"),
    donate_argnames=("k_cache", "v_cache", "k_scales", "v_scales",
                     "k_parity", "v_parity"),
)
def paged_attention_ecc_write_attend(
    query,
    k_new,
    v_new,
    ks_new,
    vs_new,
    k_cache,
    v_cache,
    k_scales,
    v_scales,
    block_table,
    context_lens,
    layer_idx,
    k_parity=None,
    v_parity=None,
    *,
    scrub: bool = False,
    codec: str = "hamming84",
    block_size: int = 128,
    num_pages: int | None = None,
    sm_scale: float | None = None,
    pages_per_chunk: int | None = None,
    precision: str = "fast",
    use_interpolation: bool = False,
    collect_stats: bool = False,
    read_inject_ber: float = 0.0,
    read_inject_seed=0,
    sliding_window: int | None = None,
):
    """Fused decode-step cache WRITE + paged attention in ONE kernel.

    Writes the new token's already-encoded PACKED codeword column into its
    page (in VMEM, during the page's streaming pass) and DMAs the page back
    to the cache, which is input/output-ALIASED so the update is guaranteed
    in-place. This keeps the KV cache out of XLA's hands during decode:
    a scatter + custom-call chain made XLA materialize a full cache copy
    per layer (measured 6x the step's useful HBM traffic).

    Args:
        query: [batch, num_q_heads, head_dim].
        k_new/v_new: packed storage words of the new token (already encoded
            + fault-injected + packed, kernels/swar.py pack_codewords):
            [batch, num_kv_heads, data_words] in scrub-extract mode (the
            parity column is the caller's to scatter - it is not a kernel
            operand), [batch, num_kv_heads, row_words] (data ++ parity)
            when parity streams, full rows for int4/fp16/fp8.
        ks_new/vs_new: [batch, num_kv_heads] f32 dequant scales.
        k_cache/v_cache/k_scales/v_scales (+ k_parity/v_parity when parity
            streams): token-minor split paged cache arrays (donated;
            returned updated).
        context_lens: [batch] int32, INCLUDING the new token (the column is
            written at index context_lens - 1 and participates in attention).

    Returns:
        (out [batch, num_q_heads, head_dim], k_cache, v_cache, k_scales,
        v_scales[, k_parity, v_parity when they were operands]
        [, stats [batch, 2]]).
    """
    (batch, num_q_heads, head_dim, num_kv_heads, data_w, group, num_pages,
     sm_scale, cp, num_chunks) = _common_setup(
        query, k_cache, block_size, codec, num_pages, block_table, sm_scale,
        pages_per_chunk)

    _check_scrub_flags(scrub, codec, use_interpolation, collect_stats,
                       read_inject_ber)
    if scrub and swar.scrub_extract_ok(codec, head_dim) and (
        k_parity is not None or v_parity is not None
    ):
        raise ValueError(
            "scrub-extract write_attend must not receive the parity arrays "
            "(they are donate-marked but never read or returned - scatter "
            "the new token's parity column outside the kernel instead, "
            "models/runtime.py)"
        )
    extract, has_parity, k_parity, v_parity = _resolve_parity(
        codec, head_dim, scrub, k_parity, v_parity
    )
    pw = k_parity.shape[3] if has_parity else 0
    kn_w = data_w + pw  # new-token column width the kernel consumes
    if k_new.shape[-1] != kn_w:
        raise ValueError(
            f"k_new last dim {k_new.shape[-1]} != expected {kn_w} "
            f"({'data-only column in scrub-extract mode' if extract else 'data ++ parity rows'})"
        )
    q4 = query.reshape(batch, num_kv_heads, group, head_dim)

    def q_map(b, c, layer, bt, cl):
        return (b, 0, 0, 0)

    def new_map(b, c, layer, bt, cl):
        return (b, 0, 0, 0)

    def new_scale_map(b, c, layer, bt, cl):
        return (b, 0, 0)

    def stats_map(b, c, layer, bt, cl):
        return (b, 0)

    n_hbm_in = 4 + (2 if has_parity else 0)
    in_specs = [
        pl.BlockSpec((None, num_kv_heads, group, head_dim), q_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (None, num_kv_heads, kn_w, 1), new_map,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (None, num_kv_heads, kn_w, 1), new_map,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (None, 1, num_kv_heads), new_scale_map,
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (None, 1, num_kv_heads), new_scale_map,
            memory_space=pltpu.VMEM,
        ),
    ] + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n_hbm_in)]

    out_specs = [
        pl.BlockSpec((None, num_kv_heads, group, head_dim), q_map,
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n_hbm_in)]
    out_shape = [jax.ShapeDtypeStruct(q4.shape, query.dtype)]
    # HBM operand order (inputs 8.. after the 3 scalar-prefetch + 5 VMEM):
    # k_cache, v_cache, [k_parity, v_parity], k_scales, v_scales; the same
    # order as outputs 1.. - aliased pairwise for guaranteed in-place update
    hbm_arrays = [k_cache, v_cache]
    if has_parity:
        hbm_arrays += [k_parity, v_parity]
    hbm_arrays += [k_scales, v_scales]
    out_shape += [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in hbm_arrays]
    aliases = {8 + i: 1 + i for i in range(n_hbm_in)}
    if collect_stats:
        out_specs.append(
            pl.BlockSpec((None, 2), stats_map, memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((batch, 2), jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, cp, num_kv_heads, data_w, block_size),
                       k_cache.dtype),
            pltpu.VMEM((2, cp, num_kv_heads, data_w, block_size),
                       v_cache.dtype),
        ]
        + (
            [
                pltpu.VMEM((2, cp, num_kv_heads, pw, block_size),
                           k_parity.dtype),
                pltpu.VMEM((2, cp, num_kv_heads, pw, block_size),
                           v_parity.dtype),
            ]
            if has_parity
            else []
        )
        + [
            pltpu.VMEM((2, cp, num_kv_heads, block_size), k_scales.dtype),
            pltpu.VMEM((2, cp, num_kv_heads, block_size), v_scales.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((num_q_heads, 128), jnp.float32),
            pltpu.VMEM((num_q_heads, 128), jnp.float32),
            pltpu.VMEM((num_q_heads, head_dim), jnp.float32),
        ]
        + (
            [pltpu.VMEM((2, num_kv_heads, 4 * (data_w + pw), 128), jnp.int32)]
            if use_interpolation and codec == "hamming84"
            else []
        ),
    )

    kernel = functools.partial(
        _paged_attn_kernel,
        codec=codec,
        block_size=block_size,
        head_dim=head_dim,
        sm_scale=sm_scale,
        pages_per_chunk=cp,
        num_chunks=num_chunks,
        max_pages=num_pages,
        num_kv_heads=num_kv_heads,
        group=group,
        precision=precision,
        fused_write=True,
        has_parity=has_parity,
        interpolate=use_interpolation,
        collect_stats=collect_stats,
        read_inject_threshold=_read_threshold(read_inject_ber, codec),
        sliding_window=sliding_window,
        scrub=extract,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=C.use_interpret(),
    )(
        jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                   jnp.asarray(read_inject_seed, jnp.int32)]),
        block_table.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        q4,
        k_new.reshape(batch, num_kv_heads, kn_w, 1).astype(k_cache.dtype),
        v_new.reshape(batch, num_kv_heads, kn_w, 1).astype(v_cache.dtype),
        ks_new.reshape(batch, 1, num_kv_heads).astype(k_scales.dtype),
        vs_new.reshape(batch, 1, num_kv_heads).astype(v_scales.dtype),
        *hbm_arrays,
    )
    out = outs[0].reshape(batch, num_q_heads, head_dim)
    res = (out,) + tuple(outs[1 : 1 + n_hbm_in])
    if collect_stats:
        return res + (outs[1 + n_hbm_in],)
    return res


# =============================================================================
# jnp reference implementation (the oracle; also the general fallback for
# prefill-shaped queries and verification runs)
# =============================================================================


def gather_pages(cache, block_table, layer_idx, num_pages, parity=None):
    """Gather [batch, num_pages*block_size, kv_heads, row_words] token-major
    rows from a token-minor stacked paged cache using the block table
    (invalid pages clamp to block 0). With `parity` (split layout), the
    parity words are gathered too and appended on the word axis - full
    logical rows."""
    def one(arr):
        table = jnp.maximum(block_table[:, :num_pages], 0)  # [batch, pages]
        layer = arr[layer_idx]  # [blocks, heads, w, bs]
        gathered = layer[table]  # [batch, pages, heads, w, bs]
        b, p, h, w, bs = gathered.shape
        # -> [batch, pages, bs, heads, w] -> [batch, tokens, heads, w]
        return jnp.transpose(gathered, (0, 1, 4, 2, 3)).reshape(
            b, p * bs, h, w
        )

    rows = one(cache)
    if parity is not None:
        rows = jnp.concatenate([rows, one(parity)], axis=-1)
    return rows


def gather_scales(scales, block_table, layer_idx, num_pages):
    """Gather [batch, tokens, kv_heads] scales from the token-minor layout
    [layers, blocks, heads, block_size]."""
    table = jnp.maximum(block_table[:, :num_pages], 0)
    layer = scales[layer_idx]  # [blocks, heads, bs]
    gathered = layer[table]  # [batch, pages, heads, bs]
    b, p, h, bs = gathered.shape
    return jnp.transpose(gathered, (0, 1, 3, 2)).reshape(b, p * bs, h)


def paged_attention_ecc_reference(
    query,
    k_cache,
    v_cache,
    k_scales,
    v_scales,
    block_table,
    context_lens,
    layer_idx,
    k_parity=None,
    v_parity=None,
    *,
    codec: str = "hamming84",
    block_size: int = 128,
    num_pages: int | None = None,
    sm_scale: float | None = None,
):
    """Slow-but-obviously-correct paged attention with explicit unpack +
    decode (the reference's `reference_attention_ecc`, attention_ecc.py:783).
    Matches the fused kernel's decode semantics (golay zeroes uncorrectable
    codewords)."""
    batch, num_q_heads, head_dim = query.shape
    _, num_blocks, num_kv_heads, data_w, bs = k_cache.shape
    group = num_q_heads // num_kv_heads
    if num_pages is None:
        num_pages = block_table.shape[1]
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5

    k_raw = gather_pages(k_cache, block_table, layer_idx, num_pages, k_parity)
    v_raw = gather_pages(v_cache, block_table, layer_idx, num_pages, v_parity)

    if codec in ("fp16", "fp8"):
        k = k_raw.astype(jnp.float32)
        v = v_raw.astype(jnp.float32)
    else:
        def decode(raw):
            cw = swar.unpack_codewords(codec, raw, head_dim)
            nib = swar.decode_values(
                codec, cw, head_dim, zero_uncorrectable=True
            )
            return nib.astype(jnp.float32)

        ks = gather_scales(k_scales, block_table, layer_idx, num_pages)
        vs = gather_scales(v_scales, block_table, layer_idx, num_pages)
        k = (decode(k_raw) - 8.0) * ks[..., None]
        v = (decode(v_raw) - 8.0) * vs[..., None]
    # [batch, tokens, kv_heads, head_dim] -> [batch, kv_heads, tokens, head_dim]
    k = jnp.moveaxis(k, 1, 2)
    v = jnp.moveaxis(v, 1, 2)

    q = query.reshape(batch, num_kv_heads, group, head_dim).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", q, k, precision=jax.lax.Precision.HIGHEST) * sm_scale
    tokens = jnp.arange(k.shape[2])
    mask = tokens[None, :] < context_lens[:, None]  # [batch, tokens]
    s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    # guard fully-masked rows
    any_valid = jnp.any(mask, axis=-1)[:, None, None, None]
    w = jax.nn.softmax(s, axis=-1)
    w = jnp.where(any_valid, w, 0.0)
    out = jnp.einsum("bhgt,bhtd->bhgd", w, v, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(batch, num_q_heads, head_dim).astype(query.dtype)
