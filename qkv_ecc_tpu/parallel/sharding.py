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
    # GPT-2's c_attn packs Q|K|V along its output dim, so a plain
    # P(None, "model") column shard would cut across the Q/K/V boundary
    # instead of splitting each segment by heads. Attention weights are
    # therefore REPLICATED (attention runs fully on each shard) and only the
    # MLP is tensor-parallel. GPT-2 TP is correspondingly guarded off in
    # tp_runtime (it is a single-chip 124M model; TP targets the llama
    # family). A proper GPT-2 TP would pre-split c_attn into three
    # head-sharded segments at conversion time.
    layer = {
        "ln_1": {"g": P(), "b": P()},
        "ln_2": {"g": P(), "b": P()},
        "c_attn": {"w": P(None, None), "b": P()},  # replicated (see note)
        "c_proj": {"w": P(None, None), "b": P()},
        "c_fc": {"w": P(None, "model"), "b": P("model")},
        "mlp_proj": {"w": P("model", None), "b": P()},
    }
    return {
        "wte": P(),
        "wpe": P(),
        "ln_f": {"g": P(), "b": P()},
        "layers": [jax.tree.map(lambda x: x, layer) for _ in range(cfg.num_layers)],
    }


def param_specs(cfg: ModelConfig) -> dict:
    if cfg.arch == "llama":
        return llama_param_specs(cfg)
    return gpt2_param_specs(cfg)


def cache_specs() -> dict:
    """Paged ECC cache sharding: kv-heads on the model axis."""
    return {
        "k_cache": P(None, None, "model", None, None),
        "v_cache": P(None, None, "model", None, None),
        "k_scales": P(None, None, "model", None),
        "v_scales": P(None, None, "model", None),
        "context_len": P(),
    }


def shard_params(params, cfg: ModelConfig, mesh: Mesh):
    """Place a param pytree onto the mesh with TP shardings."""
    specs = param_specs(cfg)

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)


def shard_cache(state: dict, mesh: Mesh):
    specs = cache_specs()
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in state.items()
    }
