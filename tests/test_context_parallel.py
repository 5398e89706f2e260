"""Context-parallel (sharded-KV) decode attention: the paged cache's block
axis shards across devices, each shard runs the fused kernel locally, and
the online-softmax partials merge with one weighted-psum pair. Must equal
single-device full-context attention exactly (the merge is algebraically
exact, not an approximation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qkv_ecc_tpu.cache.layout import ECCCacheConfig, allocate_ecc_kv_cache
from qkv_ecc_tpu.kernels import swar
from qkv_ecc_tpu.kernels.paged_attention import paged_attention_ecc
from qkv_ecc_tpu.parallel.context_parallel import (
    make_cp_attention,
    shard_context,
)

BS = 16
HKV, HQ, D = 2, 4, 64
PAGES_PER = 8  # local pages per (shard, seq)


def _build(rng, codec, context_lens, num_shards):
    """Build the SAME logical KV context twice: a single-device cache and a
    block-sharded cache (+ per-shard block tables / local context lens)."""
    batch = len(context_lens)
    local = shard_context(context_lens, num_shards, BS)  # [S, batch]
    offsets = np.zeros((num_shards, batch), np.int64)
    for s in range(1, num_shards):
        offsets[s] = offsets[s - 1] + local[s - 1]
    # whole-page splits: every NONEMPTY shard starts on a page boundary
    assert (offsets[local > 0] % BS == 0).all()

    blocks_per_shard = batch * PAGES_PER
    cfg = ECCCacheConfig(
        num_blocks=num_shards * blocks_per_shard, block_size=BS,
        num_layers=1, num_kv_heads=HKV, head_dim=D, codec=codec,
    )
    full = {k: np.array(v) for k, v in allocate_ecc_kv_cache(cfg).items()}
    shardc = {k: np.array(v) for k, v in allocate_ecc_kv_cache(cfg).items()}
    bt_full = np.full((batch, num_shards * PAGES_PER), -1, np.int32)
    bt_shard = np.full((num_shards, batch, PAGES_PER), -1, np.int32)

    for b, ctx in enumerate(context_lens):
        for name in ("k", "v"):
            x = rng.normal(size=(ctx, HKV, D)).astype(np.float32)
            absmax = np.abs(x).max(-1)
            scale = np.where(absmax == 0, 1.0, absmax / 7.0)
            qn = np.clip(np.round(x / scale[..., None]), -8, 7) + 8
            cw = swar.encode_codewords(codec, jnp.asarray(qn, jnp.int32), D)
            words = np.asarray(swar.pack_codewords(codec, cw, D))  # [ctx,H,W]
            for t in range(ctx):
                p, slot = divmod(t, BS)
                s = max(
                    si for si in range(num_shards) if offsets[si, b] <= t
                )
                lp = p - offsets[s, b] // BS
                phys_full = b * num_shards * PAGES_PER + p
                phys_local = b * PAGES_PER + lp
                phys_global = s * blocks_per_shard + phys_local
                bt_full[b, p] = phys_full
                bt_shard[s, b, lp] = phys_local
                dw = full[f"{name}_cache"].shape[3]
                full[f"{name}_cache"][0, phys_full, :, :, slot] = words[t][..., :dw]
                full[f"{name}_scales"][0, phys_full, :, slot] = scale[t]
                shardc[f"{name}_cache"][0, phys_global, :, :, slot] = words[t][..., :dw]
                shardc[f"{name}_scales"][0, phys_global, :, slot] = scale[t]
                if f"{name}_parity" in full:
                    full[f"{name}_parity"][0, phys_full, :, :, slot] = words[t][..., dw:]
                    shardc[f"{name}_parity"][0, phys_global, :, :, slot] = words[t][..., dw:]
    return full, bt_full, shardc, bt_shard, local


@pytest.fixture
def mesh4():
    devs = np.array(jax.devices()[:4]).reshape(4)
    return Mesh(devs, ("context",))


def _run_both(rng, codec, context_lens, mesh4):
    num_shards = 4
    full, bt_full, shardc, bt_shard, local = _build(
        rng, codec, context_lens, num_shards
    )
    q = jnp.asarray(
        rng.normal(size=(len(context_lens), HQ, D)).astype(np.float32)
    )
    has_parity = "k_parity" in full
    ref = paged_attention_ecc(
        q, *(jnp.asarray(full[k]) for k in
             ("k_cache", "v_cache", "k_scales", "v_scales")),
        jnp.asarray(bt_full), jnp.asarray(context_lens, jnp.int32), 0,
        *((jnp.asarray(full["k_parity"]), jnp.asarray(full["v_parity"]))
          if has_parity else ()),
        codec=codec, block_size=BS, precision="highest",
    )
    placed = {
        k: jax.device_put(
            jnp.asarray(v), NamedSharding(mesh4, P(None, "context"))
        )
        for k, v in shardc.items()
    }
    cp_fn = make_cp_attention(
        mesh4, codec=codec, block_size=BS, precision="highest",
        with_parity=has_parity,
    )
    out = cp_fn(
        q, placed["k_cache"], placed["v_cache"], placed["k_scales"],
        placed["v_scales"], jnp.asarray(bt_shard),
        jnp.asarray(local, jnp.int32), jnp.asarray(0, jnp.int32),
        *((placed["k_parity"], placed["v_parity"]) if has_parity else ()),
    )
    return out, ref, local


@pytest.mark.parametrize("codec", ["int4", "hamming84", "golay"])
def test_cp_matches_single_device(codec, rng, mesh4):
    out, ref, _ = _run_both(rng, codec, (90, 70), mesh4)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_cp_empty_shards(rng, mesh4):
    """Short contexts leave trailing shards empty; they must contribute
    nothing (no NaNs from the -inf running max)."""
    out, ref, local = _run_both(rng, "hamming84", (20, 5), mesh4)
    assert (local[2:] == 0).all()
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4
