"""Model zoo: dispatch between architectures, random init, loss helpers.

The eval harness goes through this module; adding an architecture means
adding an entry here (no model sniffing - contrast with the reference's
duck-typed `_get_attention_params`, ecc_shim.py:1556).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import gpt2, llama
from .config import ModelConfig, get_model_config
from .kv_policy import KVCachePolicy

_ARCH = {
    "gpt2": (gpt2.init_params, gpt2.forward),
    "llama": (llama.init_params, llama.forward),
}


def init_params(cfg: ModelConfig, seed: int = 0):
    init_fn, _ = _ARCH[cfg.arch]
    return init_fn(cfg, jax.random.key(seed))


def forward(params, input_ids, cfg: ModelConfig, policy: KVCachePolicy):
    _, fwd = _ARCH[cfg.arch]
    return fwd(params, input_ids, cfg, policy)


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def forward_jit(params, input_ids, cfg: ModelConfig, policy: KVCachePolicy):
    return forward(params, input_ids, cfg, policy)


def cross_entropy(logits, labels, ignore_index: int = -100):
    """Next-token CE with HF label semantics: predict labels[t+1] from
    logits[t]; positions with label == ignore_index are masked.

    Returns (sum_loss, token_count) so callers control the averaging.
    """
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll), jnp.sum(valid)


@functools.partial(jax.jit, static_argnames=("cfg", "policy"))
def loss_and_stats(params, input_ids, labels, cfg, policy):
    """One forward returning (mean_loss, token_count, logits, kv stats) -
    the per-text unit of the Monte-Carlo sweep (reference sweep.py:534-545)."""
    logits, stats = forward(params, input_ids, cfg, policy)
    total, count = cross_entropy(logits, labels)
    mean = total / jnp.maximum(count, 1)
    return mean, count, logits, stats
