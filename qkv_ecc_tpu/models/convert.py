"""HF checkpoint -> native JAX parameter conversion.

Replaces the reference's runtime dependence on `transformers` model objects
(evaluation/models.py:16): here HF checkpoints are converted once into our
param pytrees. Works from a `transformers` model instance, a torch state
dict, or a safetensors file - all gated on availability (this environment has
no network; tests use random-init tiny configs).

Weight layout notes:
  * GPT-2 Conv1D stores [in, out] which matches our convention directly.
  * HF Llama Linear stores [out, in]; we transpose to [in, out].
  * HF Llama q/k_proj use the interleaved rotary layout that matches
    `rotate_half`; our apply_rope uses the same convention, so no permutation
    is needed.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .config import ModelConfig


def _np(t):
    """torch tensor / numpy -> numpy float32."""
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_gpt2_state_dict(sd: dict, cfg: ModelConfig) -> dict:
    """HF GPT2LMHeadModel state dict -> gpt2.init_params structure."""
    g = lambda name: _np(sd[name])
    params = {
        "wte": jnp.asarray(g("transformer.wte.weight")),
        "wpe": jnp.asarray(g("transformer.wpe.weight")),
        "ln_f": {
            "g": jnp.asarray(g("transformer.ln_f.weight")),
            "b": jnp.asarray(g("transformer.ln_f.bias")),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        p = f"transformer.h.{i}."
        params["layers"].append(
            {
                "ln_1": {"g": jnp.asarray(g(p + "ln_1.weight")),
                         "b": jnp.asarray(g(p + "ln_1.bias"))},
                "ln_2": {"g": jnp.asarray(g(p + "ln_2.weight")),
                         "b": jnp.asarray(g(p + "ln_2.bias"))},
                "c_attn": {"w": jnp.asarray(g(p + "attn.c_attn.weight")),
                           "b": jnp.asarray(g(p + "attn.c_attn.bias"))},
                "c_proj": {"w": jnp.asarray(g(p + "attn.c_proj.weight")),
                           "b": jnp.asarray(g(p + "attn.c_proj.bias"))},
                "c_fc": {"w": jnp.asarray(g(p + "mlp.c_fc.weight")),
                         "b": jnp.asarray(g(p + "mlp.c_fc.bias"))},
                "mlp_proj": {"w": jnp.asarray(g(p + "mlp.c_proj.weight")),
                             "b": jnp.asarray(g(p + "mlp.c_proj.bias"))},
            }
        )
    return params


def convert_llama_state_dict(sd: dict, cfg: ModelConfig) -> dict:
    """HF LlamaForCausalLM / MistralForCausalLM state dict -> llama params."""
    g = lambda name: _np(sd[name])
    dtype = jnp.dtype(cfg.dtype)
    params = {
        "embed": jnp.asarray(g("model.embed_tokens.weight"), dtype),
        "final_norm": jnp.asarray(g("model.norm.weight"), dtype),
        "layers": [],
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(g("lm_head.weight").T, dtype)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        params["layers"].append(
            {
                "input_norm": jnp.asarray(g(p + "input_layernorm.weight"), dtype),
                "post_attn_norm": jnp.asarray(
                    g(p + "post_attention_layernorm.weight"), dtype
                ),
                "q_proj": jnp.asarray(g(p + "self_attn.q_proj.weight").T, dtype),
                "k_proj": jnp.asarray(g(p + "self_attn.k_proj.weight").T, dtype),
                "v_proj": jnp.asarray(g(p + "self_attn.v_proj.weight").T, dtype),
                "o_proj": jnp.asarray(g(p + "self_attn.o_proj.weight").T, dtype),
                "gate_proj": jnp.asarray(g(p + "mlp.gate_proj.weight").T, dtype),
                "up_proj": jnp.asarray(g(p + "mlp.up_proj.weight").T, dtype),
                "down_proj": jnp.asarray(g(p + "mlp.down_proj.weight").T, dtype),
            }
        )
    return params


def convert_hf_model(hf_model, cfg: ModelConfig) -> dict:
    """Convert from an in-memory transformers model."""
    sd = hf_model.state_dict()
    if cfg.arch == "gpt2":
        return convert_gpt2_state_dict(sd, cfg)
    return convert_llama_state_dict(sd, cfg)


def load_hf_checkpoint(name_or_path: str, cfg: ModelConfig) -> dict:
    """Load + convert an HF checkpoint (requires network or local cache)."""
    try:
        import transformers
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("transformers is required for HF conversion") from e
    model = transformers.AutoModelForCausalLM.from_pretrained(name_or_path)
    return convert_hf_model(model, cfg)
