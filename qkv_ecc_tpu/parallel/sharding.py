"""Sharding specifications: Megatron-style tensor parallelism over the
"model" axis + data parallelism over "data".

Layout (new TPU-native infrastructure; the reference is single-GPU):
  * attention: q/k/v projections column-sharded (heads split across model
    axis), o_proj row-sharded with a psum after - so the ECC paged cache is
    naturally sharded on its kv-head axis and the fused attention kernel
    runs purely locally (no collectives ride the decode hot loop).
  * MLP: gate/up column-sharded, down row-sharded + psum.
  * embeddings/norms replicated; lm_head column(vocab)-sharded.
  * KV cache [L, blocks, Hkv, bs, cw]: P(None, None, "model", None, None).
  * activations replicated over "model", batch sharded over "data".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig


def llama_param_specs(cfg: ModelConfig) -> dict:
    layer = {
        "input_norm": P(),
        "post_attn_norm": P(),
        "q_proj": P(None, "model"),
        "k_proj": P(None, "model"),
        "v_proj": P(None, "model"),
        "o_proj": P("model", None),
        "gate_proj": P(None, "model"),
        "up_proj": P(None, "model"),
        "down_proj": P("model", None),
    }
    specs = {
        "embed": P(),
        "final_norm": P(),
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, "model")
    return specs


def gpt2_param_specs(cfg: ModelConfig) -> dict:
    # GPT-2's c_attn packs Q|K|V along its output dim, so a plain column
    # shard would cut across the Q/K/V boundary instead of splitting each
    # segment by heads. shard_params therefore PERMUTES c_attn's columns
    # head-blockwise first (permute_gpt2_qkv), after which shard s's slice
    # is exactly [Q_s | K_s | V_s] and attention is fully tensor-parallel:
    # c_attn column-sharded, c_proj row-sharded + psum (its bias added once
    # after the reduction, tp_runtime._block_tp).
    layer = {
        "ln_1": {"g": P(), "b": P()},
        "ln_2": {"g": P(), "b": P()},
        "c_attn": {"w": P(None, "model"), "b": P("model")},
        "c_proj": {"w": P("model", None), "b": P()},
        "c_fc": {"w": P(None, "model"), "b": P("model")},
        "mlp_proj": {"w": P("model", None), "b": P()},
    }
    return {
        "wte": P(),
        "wpe": P(),
        "ln_f": {"g": P(), "b": P()},
        "layers": [jax.tree.map(lambda x: x, layer) for _ in range(cfg.num_layers)],
    }


def permute_gpt2_qkv(params, cfg: ModelConfig, tp: int):
    """Column-permute every c_attn [E, 3E] (and its bias) head-blockwise so
    a plain P(None, "model") shard over `tp` shards receives its own heads'
    [Q_s | K_s | V_s] contiguously. Pure relabeling: the TP block's local
    third-split (tp_runtime._block_tp) is then exactly the single-device
    Q/K/V split restricted to local heads."""
    import numpy as np

    E = cfg.num_heads * cfg.head_dim
    hl = cfg.num_heads // tp
    perm = []
    for s in range(tp):
        for seg in range(3):  # Q, K, V segments of this shard's heads
            base = seg * E + s * hl * cfg.head_dim
            perm.extend(range(base, base + hl * cfg.head_dim))
    perm = np.asarray(perm)

    def fix_layer(lp):
        lp = dict(lp)
        lp["c_attn"] = {
            "w": jnp.asarray(lp["c_attn"]["w"])[:, perm],
            "b": jnp.asarray(lp["c_attn"]["b"])[perm],
        }
        return lp

    out = dict(params)
    out["layers"] = [fix_layer(lp) for lp in params["layers"]]
    return out


def param_specs(cfg: ModelConfig) -> dict:
    if cfg.arch == "llama":
        return llama_param_specs(cfg)
    return gpt2_param_specs(cfg)


def cache_specs() -> dict:
    """Paged ECC cache sharding: kv-heads on the model axis (the split
    k_parity/v_parity arrays shard identically to the data arrays)."""
    return {
        "k_cache": P(None, None, "model", None, None),
        "v_cache": P(None, None, "model", None, None),
        "k_parity": P(None, None, "model", None, None),
        "v_parity": P(None, None, "model", None, None),
        "k_scales": P(None, None, "model", None),
        "v_scales": P(None, None, "model", None),
        "context_len": P(),
    }


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    """Place a param pytree onto the mesh with TP shardings (GPT-2: after
    the head-blockwise c_attn column permutation, see permute_gpt2_qkv)."""
    specs = param_specs(cfg)
    if cfg.arch == "gpt2":
        params = permute_gpt2_qkv(params, cfg, mesh.shape["model"])

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)


def shard_cache(state: dict, mesh: Mesh):
    specs = cache_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in state.items()
    }
