"""Model loading for evaluation.

Port of the reference's evaluation/models.py, adapted to native JAX models:
resolves a model name to (params, ModelConfig, tokenizer). HF checkpoints are
converted via models/convert.py when reachable (HF hub or local cache);
otherwise falls back to random initialization with a byte tokenizer so the
whole harness runs offline (this container has zero egress).
"""

from __future__ import annotations

import os
from typing import Tuple

from ..models.config import ModelConfig, get_model_config
from ..models.registry import init_params
from .constants import MODELS
from .data import ByteTokenizer, get_tokenizer


def load_model(
    model_name: str = "gpt2",
    *,
    allow_random_init: bool = True,
    seed: int = 0,
) -> Tuple[dict, ModelConfig, object]:
    """Resolve a model name -> (params, config, tokenizer).

    Tries the HF checkpoint (requires network/cache and, for gated models,
    HF_TOKEN - reference models.py:51-56); falls back to random init when
    allowed.
    """
    if model_name not in MODELS:
        raise ValueError(f"Unknown model: {model_name}. Known: {sorted(MODELS)}")
    meta = MODELS[model_name]
    cfg = get_model_config(meta["config"])

    if model_name in ("trained-tiny", "trained-word", "trained-100m"):
        # in-container trained checkpoint (qkv_ecc_tpu/training/)
        from ..training.trainer import load_params

        default = {
            "trained-tiny": "results/trained_tiny/checkpoint.npz",
            "trained-word": "results/trained_word/checkpoint.npz",
            "trained-100m": "results/trained_100m/checkpoint.npz",
        }[model_name]
        path = os.environ.get("QKV_TINY_CHECKPOINT", default)

        def tok_for():
            vocab_path = path + ".vocab.json"
            if (model_name in ("trained-word", "trained-100m")
                    and os.path.exists(vocab_path)):
                from ..training.corpus import WordTokenizer

                return WordTokenizer.load(vocab_path)
            return ByteTokenizer()

        if os.path.exists(path):
            return load_params(path, cfg), cfg, tok_for()
        if not allow_random_init:
            raise RuntimeError(
                f"{model_name} checkpoint not found at {path}; run "
                "python -m qkv_ecc_tpu.evaluation.experiments.train_tiny"
            )
        return init_params(cfg, seed), cfg, tok_for()

    hf_id = meta["hf_id"]
    if hf_id is not None:
        if meta["requires_auth"] and not os.environ.get("HF_TOKEN"):
            hf_id_ok = False
        else:
            hf_id_ok = True
        if hf_id_ok:
            try:
                from ..models.convert import load_hf_checkpoint

                params = load_hf_checkpoint(hf_id, cfg)
                tokenizer = get_tokenizer(model_name, hf_id)
                return params, cfg, tokenizer
            except Exception as e:  # no network / no cache
                if not allow_random_init:
                    raise RuntimeError(
                        f"Could not load HF checkpoint '{hf_id}': {e}"
                    ) from e

    if not allow_random_init and hf_id is None:
        raise RuntimeError(f"No checkpoint available for {model_name}")

    params = init_params(cfg, seed)
    return params, cfg, ByteTokenizer()


def get_model_info(model_name: str) -> dict:
    if model_name not in MODELS:
        raise ValueError(f"Unknown model: {model_name}")
    return dict(MODELS[model_name])


def estimate_param_count(cfg: ModelConfig) -> int:
    E, V, I, L = cfg.hidden_size, cfg.vocab_size, cfg.intermediate_size, cfg.num_layers
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if cfg.arch == "gpt2":
        per_layer = E * 3 * E + 3 * E + E * E + E + E * I + I + I * E + E + 4 * E
        return V * E + cfg.max_position_embeddings * E + L * per_layer + 2 * E
    per_layer = E * (H * D) + 2 * E * (Hkv * D) + (H * D) * E + 3 * E * I + 2 * E
    total = V * E + L * per_layer + E
    if not cfg.tie_word_embeddings:
        total += E * V
    return total
