"""Shared model building blocks: norms, rotary embeddings, attention.

Pure-functional JAX (param dicts), designed for pjit sharding: every matmul
keeps batch*seq on the MXU rows and hidden on columns, activations stay in
the model dtype (bf16 on TPU), and attention uses fp32 softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x, g, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * g + b


def rms_norm(x, g, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * g


def _llama3_freq_scaling(inv_freq: np.ndarray) -> np.ndarray:
    """Llama-3.1 NTK-by-parts rope scaling (factor 8, low 1, high 4,
    original context 8192)."""
    factor = 8.0
    low_freq_factor = 1.0
    high_freq_factor = 4.0
    old_context_len = 8192.0
    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    wavelen = 2 * np.pi / inv_freq
    scaled = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    smooth = (old_context_len / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = (1 - smooth) * inv_freq / factor + smooth * inv_freq
    is_medium = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return np.where(is_medium, smoothed, scaled)


def rope_frequencies(head_dim: int, theta: float, llama3_scaling: bool = False):
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if llama3_scaling:
        inv_freq = _llama3_freq_scaling(inv_freq)
    return jnp.asarray(inv_freq, jnp.float32)


def apply_rope(x, positions, inv_freq):
    """Rotate [B, S, H, D] by position. HF 'rotate_half' convention:
    pairs are (x[..., :D/2], x[..., D/2:])."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B, S, D/2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, S, 1, D/2]
    sin = jnp.sin(angles)[:, :, None, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rotated = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return rotated.astype(x.dtype)


def causal_attention(q, k, v, num_kv_groups: int, *, kv_offset: int = 0,
                     sliding_window: int | None = None):
    """Grouped-query causal SDPA.

    q: [B, S, Hq, D]; k, v: [B, T, Hkv, D]. The last S query positions align
    with the last S of T context positions (kv_offset = T - S).
    sliding_window W (Mistral): query position p attends only to context
    positions j with p - W < j <= p (HF eager semantics).
    Returns [B, S, Hq, D]. fp32 softmax.
    """
    B, S, Hq, D = q.shape
    T, Hkv = k.shape[1], k.shape[2]
    g = num_kv_groups
    qg = q.reshape(B, S, Hkv, g, D)
    s = jnp.einsum("bshgd,bthd->bhgst", qg, k).astype(jnp.float32) / jnp.sqrt(
        jnp.float32(D)
    )
    qi = jnp.arange(S)[:, None]
    tj = jnp.arange(T)[None, :]
    mask = tj <= qi + kv_offset
    if sliding_window is not None:
        mask = mask & (tj > qi + kv_offset - sliding_window)
    s = jnp.where(mask[None, None, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgst,bthd->bshgd", w, v)
    return out.reshape(B, S, Hq, D)
