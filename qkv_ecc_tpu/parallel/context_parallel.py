"""Context-parallel (sharded-KV) decode attention.

Long-context story for the framework (the reference has none - its only
sequence scaling is paged blocks on one GPU, SURVEY.md §5.7): the paged ECC
cache's BLOCK axis is sharded across devices, every device runs the fused
paged-attention kernel over its local page shard (inline ECC decode stays
collective-free), and the per-shard online-softmax states merge with one
log-sum-exp-weighted psum pair - flash-decoding across chips. KV memory
capacity and decode-time ECC work both scale linearly with the axis size;
only [batch, heads, head_dim]-sized partials ride the interconnect.

Composable with tensor parallelism: shard heads on "model" and pages on
"context" in the same mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.paged_attention import paged_attention_ecc

_NEG = -1e30


def merge_softmax_shards(acc, m, l, axis_name: str):
    """Merge per-shard unnormalized online-softmax states.

    acc: [b, Hq, D] unnormalized weighted V sums; m/l: [b, Hq] running
    max / normalizer of each shard. Returns the exact global attention
    output (empty shards carry m = -1e30 and contribute nothing)."""
    m_g = jax.lax.pmax(m, axis_name)  # [b, Hq]
    w = jnp.exp(m - jnp.where(m_g > _NEG / 2, m_g, 0.0))  # guard all-empty
    num = jax.lax.psum(acc * w[..., None], axis_name)
    den = jax.lax.psum(l * w, axis_name)
    safe = jnp.where(den > 0, den, 1.0)
    return jnp.where(den[..., None] > 0, num / safe[..., None], 0.0)


def cp_paged_attention_ecc(
    query,
    k_cache,
    v_cache,
    k_scales,
    v_scales,
    block_table_local,
    context_lens_local,
    layer_idx,
    k_parity=None,
    v_parity=None,
    *,
    axis_name: str = "context",
    **kernel_kwargs,
):
    """Sharded-KV decode attention; call INSIDE shard_map.

    Each device passes its LOCAL cache shard (incl. the split-layout parity
    shards for correcting reads), a block table indexing local physical
    blocks, and the number of context tokens it owns. The query is
    replicated along `axis_name`. Any codec / interpolation / sliding
    window options forward to the fused kernel."""
    acc, m, l = paged_attention_ecc(
        query, k_cache, v_cache, k_scales, v_scales,
        block_table_local, context_lens_local, layer_idx,
        k_parity, v_parity,
        return_softmax_state=True, **kernel_kwargs,
    )
    out = merge_softmax_shards(acc, m, l, axis_name)
    return out.astype(query.dtype)


def shard_context(context_lens, num_shards: int, block_size: int):
    """Contiguous-chunk split of each sequence's context across shards.

    Returns [num_shards, batch] local context lengths: shard s owns tokens
    [s*ceil_pages, ...) in units of whole pages (a page never straddles
    shards, so local block tables stay dense)."""
    context_lens = np.asarray(context_lens)
    pages = -(-context_lens // block_size)  # per seq
    per_shard_pages = -(-pages // num_shards)
    local = np.zeros((num_shards, len(context_lens)), np.int32)
    for b, ctx in enumerate(context_lens):
        remaining = int(ctx)
        for s in range(num_shards):
            take = min(remaining, int(per_shard_pages[b]) * block_size)
            local[s, b] = take
            remaining -= take
    return local


def make_cp_attention(mesh: Mesh, axis_name: str = "context",
                      with_parity: bool = False, **kernel_kwargs):
    """jit-compiled sharded-KV attention over `mesh[axis_name]`.

    Expects caches sharded on their block axis, block tables + context
    lens pre-split per shard (leading axis = shard), query replicated.
    Returns fn(query, k, v, ks, vs, bt_sharded, ctx_sharded, layer
    [, k_parity, v_parity with with_parity=True - required for correcting
    reads of the split-layout ECC caches]) -> [batch, Hq, head_dim]."""
    spec_cache = P(None, axis_name, None, None, None)
    spec_scale = P(None, axis_name, None, None)
    spec_shard = P(axis_name)

    def _inner(q, k, v, ks, vs, bt, cl, layer, *parity):
        # leading shard axis of bt/cl is consumed by shard_map
        return cp_paged_attention_ecc(
            q, k, v, ks, vs, bt[0], cl[0], layer, *parity,
            axis_name=axis_name, **kernel_kwargs,
        )

    in_specs = (P(), spec_cache, spec_cache, spec_scale, spec_scale,
                spec_shard, spec_shard, P())
    if with_parity:
        in_specs = in_specs + (spec_cache, spec_cache)
    fn = jax.shard_map(
        _inner,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)
