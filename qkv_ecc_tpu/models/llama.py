"""Llama-family (Llama 3.x / Mistral) in pure JAX with the ECC-protected KV
path: RMSNorm, rotary embeddings (with Llama-3.1 NTK-by-parts scaling), GQA,
SwiGLU MLP, untied LM head.

Native model definition replacing the reference's monkey-patched HF
Llama/Mistral (kv_cache/ecc_shim.py:1317 `_forward_llama`). The policy is
applied to post-RoPE K (as the reference caches post-RoPE keys,
ecc_shim.py:1348-1353). Returns (logits, stats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .kv_policy import KVCachePolicy, merge_stats, process_kv
from .layers import apply_rope, causal_attention, rms_norm, rope_frequencies


def init_params(cfg: ModelConfig, key) -> dict:
    keys = iter(jax.random.split(key, 3 + 8 * cfg.num_layers))
    E, V, I = cfg.hidden_size, cfg.vocab_size, cfg.intermediate_size
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def normal(k, shape, std=0.02):
        return jax.random.normal(k, shape, jnp.float32) * std

    params = {
        "embed": normal(next(keys), (V, E)),
        "final_norm": jnp.ones(E),
        "layers": [],
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = normal(next(keys), (E, V))
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "input_norm": jnp.ones(E),
                "post_attn_norm": jnp.ones(E),
                "q_proj": normal(next(keys), (E, H * D)),
                "k_proj": normal(next(keys), (E, Hkv * D)),
                "v_proj": normal(next(keys), (E, Hkv * D)),
                "o_proj": normal(next(keys), (H * D, E)),
                "gate_proj": normal(next(keys), (E, I)),
                "up_proj": normal(next(keys), (E, I)),
                "down_proj": normal(next(keys), (I, E)),
            }
        )
    return params


def _block(x, lp, cfg: ModelConfig, policy, layer_idx, positions, inv_freq):
    B, S, E = x.shape
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
    q = (h @ lp["q_proj"]).reshape(B, S, H, D)
    k = (h @ lp["k_proj"]).reshape(B, S, Hkv, D)
    v = (h @ lp["v_proj"]).reshape(B, S, Hkv, D)

    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)

    k, v, stats = process_kv(k, v, policy, layer_idx, seq_axis=1)
    k = k.astype(x.dtype)
    v = v.astype(x.dtype)

    attn = causal_attention(
        q, k, v, cfg.num_kv_groups, sliding_window=cfg.sliding_window
    ).reshape(B, S, H * D)
    x = x + attn @ lp["o_proj"]

    h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
    h = jax.nn.silu(h @ lp["gate_proj"]) * (h @ lp["up_proj"])
    x = x + h @ lp["down_proj"]
    return x, stats


def forward(params, input_ids, cfg: ModelConfig, policy: KVCachePolicy):
    """input_ids [B, S] -> (logits [B, S, V], stats)."""
    B, S = input_ids.shape
    x = params["embed"][input_ids].astype(jnp.dtype(cfg.dtype))
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling_llama3)
    stats = None
    for i, lp in enumerate(params["layers"]):
        x, s = _block(x, lp, cfg, policy, i, positions, inv_freq)
        stats = merge_stats(stats, s)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    logits = (x @ head.astype(x.dtype)).astype(jnp.float32)
    return logits, stats
