"""Evaluation metrics: perplexity (sliding window), KL divergence, top-5
accuracy, catastrophic failure rate.

Port of the reference's evaluation/metrics.py with identical protocol
(sliding window with -100 label masking for seen positions, per-sample PPL,
KL(clean || corrupted) in nats against cached clean logits), computed on our
native JAX models instead of patched HF modules.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.kv_policy import KVCachePolicy
from ..models.registry import forward_jit, loss_and_stats
from .data import pad_to_bucket, tokenize


def _text_windows(ids: np.ndarray, max_length: int, stride: int):
    """Sliding windows with -100 masking of already-scored positions
    (reference metrics.py:72-100)."""
    seq_len = ids.shape[1]
    prev_end = 0
    for begin in range(0, seq_len, stride):
        end = min(begin + max_length, seq_len)
        target_len = end - max(begin, prev_end)
        if target_len <= 0:
            prev_end = end
            if end >= seq_len:
                return
            continue
        window = ids[:, begin:end]
        labels = window.copy()
        if begin > 0:
            labels[:, : min(prev_end - begin, end - begin)] = -100
        yield window, labels, target_len
        prev_end = end
        if end >= seq_len:
            return


def compute_perplexity(
    params, cfg, policy: KVCachePolicy, tokenizer, texts,
    max_length: int = 512, stride: int = 256,
) -> float:
    """Aggregate sliding-window PPL = exp(total_loss / total_tokens)."""
    total_loss = 0.0
    total_tokens = 0
    for text in texts:
        if not text.strip():
            continue
        ids = tokenize(tokenizer, text)
        if ids.shape[1] == 0:
            continue
        for window, labels, target_len in _text_windows(ids, max_length, stride):
            pw, _, L = pad_to_bucket(window, bucket=32)
            pl = np.full_like(pw, -100)
            pl[:, :L] = labels
            loss, count, _, _ = loss_and_stats(
                params, jnp.asarray(pw), jnp.asarray(pl), cfg, policy
            )
            loss = float(loss)
            if math.isnan(loss) or math.isinf(loss):
                continue
            total_loss += loss * target_len
            total_tokens += target_len
    if total_tokens == 0:
        return float("inf")
    return math.exp(total_loss / total_tokens)


def compute_per_sample_perplexity(
    params, cfg, policy, tokenizer, texts, max_length: int = 512, stride: int = 256
) -> List[float]:
    out = []
    for text in texts:
        if not text.strip():
            out.append(float("inf"))
            continue
        ids = tokenize(tokenizer, text)
        total_loss, total_tokens = 0.0, 0
        for window, labels, target_len in _text_windows(ids, max_length, stride):
            pw, _, L = pad_to_bucket(window, bucket=32)
            pl = np.full_like(pw, -100)
            pl[:, :L] = labels
            loss, count, _, _ = loss_and_stats(
                params, jnp.asarray(pw), jnp.asarray(pl), cfg, policy
            )
            loss = float(loss)
            if not (math.isnan(loss) or math.isinf(loss)):
                total_loss += loss * target_len
                total_tokens += target_len
        out.append(
            math.exp(total_loss / total_tokens) if total_tokens else float("inf")
        )
    return out


def compute_catastrophic_rate(perplexities: List[float], threshold: float = 1000.0):
    if not perplexities:
        return 0.0
    n = sum(1 for p in perplexities if p > threshold or math.isinf(p))
    return n / len(perplexities)


def compute_kl_divergence(logits_a, logits_b, temperature: float = 1.0) -> float:
    """KL(a || b) in nats, averaged over positions (reference metrics.py:111)."""
    log_p = jax.nn.log_softmax(jnp.asarray(logits_a) / temperature, axis=-1)
    log_q = jax.nn.log_softmax(jnp.asarray(logits_b) / temperature, axis=-1)
    kl = jnp.sum(jnp.exp(log_p) * (log_p - log_q), axis=-1).mean()
    return float(kl)


def generate_clean_logits(
    params, cfg, tokenizer, texts, max_length: int = 256
) -> List[Optional[np.ndarray]]:
    """FP16-oracle logits per text, host-cached (reference metrics.py:230)."""
    clean_policy = KVCachePolicy(codec="fp16")
    out = []
    for text in texts:
        if not text.strip():
            out.append(None)
            continue
        ids = tokenize(tokenizer, text, max_length)
        padded, _, L = pad_to_bucket(ids, bucket=32)
        logits, _ = forward_jit(params, jnp.asarray(padded), cfg, clean_policy)
        out.append(np.asarray(logits[0, :L], dtype=np.float32))
    return out


def compute_mean_kl_divergence(
    params, cfg, policy, tokenizer, texts, clean_logits_list, max_length: int = 256
) -> float:
    kls = []
    for text, clean in zip(texts, clean_logits_list):
        if not text.strip() or clean is None:
            continue
        ids = tokenize(tokenizer, text, max_length)
        if ids.shape[1] < 2:
            continue
        padded, _, L = pad_to_bucket(ids, bucket=32)
        logits, _ = forward_jit(params, jnp.asarray(padded), cfg, policy)
        corrupted = np.asarray(logits[0, :L])
        n = min(corrupted.shape[0], clean.shape[0])
        kl = compute_kl_divergence(clean[:n], corrupted[:n])
        if not (math.isnan(kl) or math.isinf(kl)):
            kls.append(kl)
    return sum(kls) / len(kls) if kls else 0.0


def compute_top5_accuracy(
    params, cfg, policy, tokenizer, texts, max_length: int = 256
) -> float:
    total, hits = 0, 0
    for text in texts:
        if not text.strip():
            continue
        ids = tokenize(tokenizer, text, max_length)
        if ids.shape[1] < 2:
            continue
        padded, _, L = pad_to_bucket(ids, bucket=32)
        logits, _ = forward_jit(params, jnp.asarray(padded), cfg, policy)
        top5 = np.asarray(
            jax.lax.top_k(logits[0, : L - 1], 5)[1]
        )  # [L-1, 5]
        targets = np.asarray(ids[0, 1:])
        hits += int((top5 == targets[:, None]).any(axis=1).sum())
        total += targets.shape[0]
    return hits / total if total else 0.0
