"""GPT-2 in pure JAX with the ECC-protected KV path.

Native model definition replacing the reference's monkey-patched HF GPT-2
(kv_cache/ecc_shim.py:1266 `_forward_gpt2`): combined c_attn QKV projection,
absolute position embeddings, pre-LN blocks, GELU MLP, tied LM head.

Forward applies `KVCachePolicy` to each layer's K/V before attention - the
roundtrip-equivalent of the reference's write-then-attend through the paged
cache (see models/kv_policy.py). Returns (logits, stats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .kv_policy import KVCachePolicy, merge_stats, process_kv
from .layers import causal_attention, layer_norm


def init_params(cfg: ModelConfig, key) -> dict:
    """Random init (GPT-2 initialization: normal(0.02))."""
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))
    E, V, P = cfg.hidden_size, cfg.vocab_size, cfg.max_position_embeddings
    I = cfg.intermediate_size

    def normal(k, shape, std=0.02):
        return jax.random.normal(k, shape, jnp.float32) * std

    params = {
        "wte": normal(next(keys), (V, E)),
        "wpe": normal(next(keys), (P, E), std=0.01),
        "ln_f": {"g": jnp.ones(E), "b": jnp.zeros(E)},
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "ln_1": {"g": jnp.ones(E), "b": jnp.zeros(E)},
                "ln_2": {"g": jnp.ones(E), "b": jnp.zeros(E)},
                # GPT-2 Conv1D convention: weight [in, out]
                "c_attn": {"w": normal(next(keys), (E, 3 * E)), "b": jnp.zeros(3 * E)},
                "c_proj": {
                    "w": normal(next(keys), (E, E), std=0.02 / np.sqrt(2 * cfg.num_layers)),
                    "b": jnp.zeros(E),
                },
                "c_fc": {"w": normal(next(keys), (E, I)), "b": jnp.zeros(I)},
                "mlp_proj": {
                    "w": normal(next(keys), (I, E), std=0.02 / np.sqrt(2 * cfg.num_layers)),
                    "b": jnp.zeros(E),
                },
            }
        )
    return params


def _block(x, layer_params, cfg: ModelConfig, policy: KVCachePolicy, layer_idx: int):
    B, S, E = x.shape
    H, D = cfg.num_heads, cfg.head_dim

    h = layer_norm(x, layer_params["ln_1"]["g"], layer_params["ln_1"]["b"], cfg.layer_norm_eps)
    qkv = h @ layer_params["c_attn"]["w"] + layer_params["c_attn"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, D)
    k = k.reshape(B, S, cfg.num_kv_heads, D)
    v = v.reshape(B, S, cfg.num_kv_heads, D)

    k, v, stats = process_kv(k, v, policy, layer_idx, seq_axis=1)
    k = k.astype(x.dtype)
    v = v.astype(x.dtype)

    attn = causal_attention(q, k, v, cfg.num_kv_groups)
    attn = attn.reshape(B, S, E)
    x = x + attn @ layer_params["c_proj"]["w"] + layer_params["c_proj"]["b"]

    h = layer_norm(x, layer_params["ln_2"]["g"], layer_params["ln_2"]["b"], cfg.layer_norm_eps)
    h = jax.nn.gelu(h @ layer_params["c_fc"]["w"] + layer_params["c_fc"]["b"], approximate=True)
    x = x + h @ layer_params["mlp_proj"]["w"] + layer_params["mlp_proj"]["b"]
    return x, stats


def forward(params, input_ids, cfg: ModelConfig, policy: KVCachePolicy):
    """input_ids [B, S] -> (logits [B, S, V], stats)."""
    B, S = input_ids.shape
    pos = jnp.arange(S)
    x = params["wte"][input_ids] + params["wpe"][pos][None]
    stats = None
    for i, lp in enumerate(params["layers"]):
        x, s = _block(x, lp, cfg, policy, i)
        stats = merge_stats(stats, s)
    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], cfg.layer_norm_eps)
    logits = x @ params["wte"].T
    return logits, stats
