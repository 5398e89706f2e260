"""Byte-level LM training loop (optax AdamW, jitted train step).

Trains this framework's own native model definitions (models/gpt2.py /
models/llama.py) - the same forward the evaluation harness uses, with the
fp16 (identity) KV policy so training sees clean attention. Checkpoints
are plain .npz pytrees (no orbax dependency needed at this scale).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.kv_policy import KVCachePolicy
from ..models.registry import cross_entropy, forward, init_params


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    steps: int = 4000
    batch: int = 32
    seq_len: int = 256
    lr: float = 3e-4
    warmup: int = 200
    weight_decay: float = 0.01
    clip_norm: float = 1.0
    seed: int = 0
    log_every: int = 200


def _sample_batch(rng: np.random.Generator, data: np.ndarray, batch: int,
                  seq_len: int) -> np.ndarray:
    starts = rng.integers(0, len(data) - seq_len - 1, size=batch)
    return np.stack([data[s : s + seq_len + 1] for s in starts]).astype(np.int32)


def train_tiny(
    cfg: ModelConfig,
    corpus: bytes,
    tcfg: TrainConfig = TrainConfig(),
    progress: Optional[Callable[[int, float, float], None]] = None,
):
    """Train cfg on a corpus (raw bytes -> byte-level LM, or a pre-
    tokenized int array); returns (params, final_loss_nats)."""
    import optax

    if isinstance(corpus, (bytes, bytearray)):
        assert cfg.vocab_size >= 256, "byte-level training needs vocab >= 256"
        data = np.frombuffer(corpus, dtype=np.uint8)
    else:
        data = np.asarray(corpus)
        assert data.max() < cfg.vocab_size
    params = init_params(cfg, tcfg.seed)
    policy = KVCachePolicy(codec="fp16")

    warmup = min(tcfg.warmup, max(tcfg.steps // 10, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.lr, warmup, tcfg.steps, tcfg.lr * 0.1
    )
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.clip_norm),
        optax.adamw(schedule, weight_decay=tcfg.weight_decay),
    )
    opt_state = tx.init(params)

    def loss_fn(p, chunk):
        ids = chunk[:, :-1]
        logits, _ = forward(p, ids, cfg, policy)
        # cross_entropy shifts internally: logits[t] predicts ids[t+1]
        total, count = cross_entropy(logits, ids)
        return total / jnp.maximum(count, 1)

    @jax.jit
    def train_step(p, o, chunk):
        loss, grads = jax.value_and_grad(loss_fn)(p, chunk)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    rng = np.random.default_rng(tcfg.seed)
    t0 = time.time()
    loss = float("nan")
    for step in range(tcfg.steps):
        chunk = jnp.asarray(_sample_batch(rng, data, tcfg.batch, tcfg.seq_len))
        params, opt_state, loss_t = train_step(params, opt_state, chunk)
        if step % tcfg.log_every == 0 or step == tcfg.steps - 1:
            loss = float(loss_t)
            if progress:
                progress(step, loss, time.time() - t0)
    return params, loss


def save_params(params, path: str, cfg: ModelConfig = None):
    """Flatten the param pytree into an .npz keyed by tree path."""
    import json
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)
    if cfg is not None:
        with open(path + ".json", "w") as fh:
            json.dump(dataclasses.asdict(cfg), fh, indent=2)


def load_params(path: str, cfg: ModelConfig):
    """Inverse of save_params: rebuild the pytree using a freshly
    initialized structure as the template."""
    template = init_params(cfg, 0)
    loaded = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        arr = loaded[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
