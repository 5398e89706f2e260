"""Fused paged attention with inline ECC decode - the flagship Pallas kernel.

TPU-native redesign of the reference's fused Triton kernel
(kv_cache/attention_ecc.py:264 `paged_attention_ecc_kernel`). Decode-phase
attention (q_len == 1 per sequence): loads ECC codewords from the paged HBM
cache, decodes them inline (SECDED bit-twiddling or the arithmetic Golay
decoder), dequantizes, and accumulates an online softmax - decoded K/V are
never materialized in HBM.

Key differences from the reference (deliberate, TPU-first):
  * Grid = (batch, kv_head, page) with the block table as a scalar-prefetch
    argument: the page->physical-block indirection happens in the BlockSpec
    index_map, so Pallas's pipeline machinery double-buffers the HBM->VMEM
    page DMAs automatically (the reference hand-rolled a per-token pointer
    loop, attention_ecc.py:346-421).
  * GQA is native: each grid step attends all `q_heads_per_kv` query heads of
    one KV head against the shared page (the reference materialized K/V per
    query head via repeat_interleave in its Python path).
  * Golay IS fused: the arithmetic IMLD decoder replaces the 4096-entry
    syndrome LUT, which is what kept Golay out of the reference's fused
    kernel (attention_ecc.py:759-775 falls back to Python).
  * Online softmax state lives in VMEM scratch that persists across the
    sequential page dimension of the grid (flash-decoding style).

Supported codecs: int4 (unprotected), hamming74, hamming84, golay. Like the
reference's inline decoders, hamming84 PRESERVES double-error data
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

_B_MASKS = tuple(int(m) for m in GOLAY_B_ROW_MASKS)
_NEG_INF = -1e30


def _decode_block(codec: str, raw, head_dim: int):
    """Decode one [block_size, row_codewords] tile -> int32 nibbles
    [block_size, head_dim]."""
    x = raw.astype(jnp.int32)
    if codec == "int4":
        return x & 0xF
    if codec == "hamming74":
        data, _ = C.hamming74_decode_i32(x)
        return data
    if codec == "hamming84":
        data, _ = C.hamming84_decode_i32(x)
        return data
    if codec == "golay":
        data12, _ = C.golay_decode_i32(x, _B_MASKS, zero_uncorrectable=True)
        # third-partitioned packing: three contiguous nibble planes
        planes = jnp.concatenate(
            [(data12 >> 0) & 0xF, (data12 >> 4) & 0xF, (data12 >> 8) & 0xF],
            axis=-1,
        )
        return planes[:, :head_dim]
    raise ValueError(f"fused kernel does not support codec '{codec}'")


def _paged_attn_kernel(
    # scalar prefetch
    layer_ref,
    block_tables_ref,
    context_lens_ref,
    # VMEM inputs
    q_ref,
    k_ref,
    v_ref,
    ks_ref,
    vs_ref,
    # outputs
    out_ref,
    # scratch
    m_scr,
    l_scr,
    acc_scr,
    *,
    codec: str,
    block_size: int,
    head_dim: int,
    sm_scale: float,
    num_pages: int,
):
    b = pl.program_id(0)
    p = pl.program_id(2)
    ctx = context_lens_ref[b]

    @pl.when(p == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    page_start = p * block_size

    @pl.when(page_start < ctx)
    def _process():
        k_nib = _decode_block(codec, k_ref[:], head_dim)  # [bs, D]
        v_nib = _decode_block(codec, v_ref[:], head_dim)

        k_scale = ks_ref[:].astype(jnp.float32)  # [bs, 1]
        v_scale = vs_ref[:].astype(jnp.float32)
        k = (k_nib.astype(jnp.float32) - 8.0) * k_scale
        v = (v_nib.astype(jnp.float32) - 8.0) * v_scale

        q = q_ref[:].astype(jnp.float32)  # [group, D]
        s = (
            jax.lax.dot_general(
                q,
                k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            * sm_scale
        )  # [group, bs]

        token_ids = page_start + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        s = jnp.where(token_ids < ctx, s, _NEG_INF)

        m_prev = m_scr[:, :1]  # [group, 1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p_ij = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p_ij, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p_ij,
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(p == num_pages - 1)
    def _finalize():
        l_fin = l_scr[:, :1]
        safe_l = jnp.where(l_fin > 0, l_fin, 1.0)
        out = jnp.where(l_fin > 0, acc_scr[:] / safe_l, 0.0)
        out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("codec", "block_size", "num_pages", "sm_scale"),
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
    *,
    codec: str = "hamming84",
    block_size: int = 16,
    num_pages: int | None = None,
    sm_scale: float | None = None,
):
    """Decode-phase fused paged attention with inline ECC decode.

    Args:
        query: [batch, num_q_heads, head_dim] (one decode token per sequence).
        k_cache/v_cache: [num_layers, num_blocks, num_kv_heads, block_size,
            row_codewords] (uint8 for int4/hamming, int32 for golay).
        k_scales/v_scales: [num_layers, num_blocks, num_kv_heads, block_size].
        block_table: int32 [batch, max_blocks] (-1 for unallocated).
        context_lens: int32 [batch].
        layer_idx: which layer of the stacked cache to attend over.
        codec: int4 | hamming74 | hamming84 | golay.
        num_pages: static page-loop bound (default: block_table.shape[1]).

    Returns:
        [batch, num_q_heads, head_dim] attention output (query dtype).
    """
    batch, num_q_heads, head_dim = query.shape
    _, num_blocks, num_kv_heads, bs, row_cw = k_cache.shape
    assert bs == block_size, (bs, block_size)
    group = num_q_heads // num_kv_heads
    assert group * num_kv_heads == num_q_heads

    if num_pages is None:
        num_pages = block_table.shape[1]
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5

    def q_map(b, h, p, layer, bt, cl):
        return (b, h, 0, 0)

    def kv_map(b, h, p, layer, bt, cl):
        phys = jnp.maximum(bt[b, p], 0)
        return (layer[0], phys, h, 0, 0)

    def scale_map(b, h, p, layer, bt, cl):
        phys = jnp.maximum(bt[b, p], 0)
        return (layer[0], phys, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_kv_heads, num_pages),
        in_specs=[
            pl.BlockSpec(
                (None, None, group, head_dim), q_map, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, None, None, bs, row_cw), kv_map, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, None, None, bs, row_cw), kv_map, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, None, None, bs, 1), scale_map, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (None, None, None, bs, 1), scale_map, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, None, group, head_dim), q_map, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, head_dim), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _paged_attn_kernel,
        codec=codec,
        block_size=block_size,
        head_dim=head_dim,
        sm_scale=float(sm_scale),
        num_pages=num_pages,
    )

    q4 = query.reshape(batch, num_kv_heads, group, head_dim)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q4.shape, query.dtype),
        interpret=C.use_interpret(),
    )(
        jnp.asarray([layer_idx], jnp.int32),
        block_table.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        q4,
        k_cache,
        v_cache,
        k_scales[..., None],
        v_scales[..., None],
    )
    return out.reshape(batch, num_q_heads, head_dim)


# =============================================================================
# jnp reference implementation (the oracle; also the general fallback for
# prefill-shaped queries, fp16/fp8 codecs, and the interpolation path)
# =============================================================================


def gather_pages(cache, block_table, layer_idx, num_pages):
    """Gather [batch, num_pages*block_size, kv_heads, row_cw] from a stacked
    paged cache using the block table (invalid pages clamp to block 0)."""
    table = jnp.maximum(block_table[:, :num_pages], 0)  # [batch, pages]
    layer = cache[layer_idx]  # [blocks, heads, bs, cw]
    gathered = layer[table]  # [batch, pages, heads, bs, cw]
    b, p, h, bs = gathered.shape[:4]
    return jnp.moveaxis(gathered, 2, 3).reshape(b, p * bs, h, *gathered.shape[4:])


def paged_attention_ecc_reference(
    query,
    k_cache,
    v_cache,
    k_scales,
    v_scales,
    block_table,
    context_lens,
    layer_idx,
    *,
    codec: str = "hamming84",
    block_size: int = 16,
    num_pages: int | None = None,
    sm_scale: float | None = None,
):
    """Slow-but-obviously-correct paged attention with explicit decode
    (the reference's `reference_attention_ecc`, attention_ecc.py:783)."""
    from ..codecs.reference import hamming74_decode, hamming84_decode
    from ..kernels.common import golay_decode_i32

    batch, num_q_heads, head_dim = query.shape
    _, num_blocks, num_kv_heads, bs, row_cw = k_cache.shape
    group = num_q_heads // num_kv_heads
    if num_pages is None:
        num_pages = block_table.shape[1]
    if sm_scale is None:
        sm_scale = float(head_dim) ** -0.5

    def decode(raw):
        x = raw.astype(jnp.int32)
        if codec == "int4":
            return x & 0xF
        if codec == "hamming74":
            data, _, _ = hamming74_decode(raw.astype(jnp.uint8))
            return data.astype(jnp.int32)
        if codec == "hamming84":
            data, _, _, _ = hamming84_decode(raw.astype(jnp.uint8))
            return data.astype(jnp.int32)
        if codec == "golay":
            data12, _ = golay_decode_i32(x, _B_MASKS, zero_uncorrectable=True)
            planes = jnp.concatenate(
                [(data12 >> 0) & 0xF, (data12 >> 4) & 0xF, (data12 >> 8) & 0xF],
                axis=-1,
            )
            return planes[..., :head_dim]
        raise ValueError(codec)

    k_raw = gather_pages(k_cache, block_table, layer_idx, num_pages)
    v_raw = gather_pages(v_cache, block_table, layer_idx, num_pages)
    ks = gather_pages(k_scales[..., None], block_table, layer_idx, num_pages)[..., 0]
    vs = gather_pages(v_scales[..., None], block_table, layer_idx, num_pages)[..., 0]

    k = (decode(k_raw).astype(jnp.float32) - 8.0) * ks[..., None]
    v = (decode(v_raw).astype(jnp.float32) - 8.0) * vs[..., None]
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
