"""Pluggable INT4 quantization backends (jnp).

TPU-native port of the reference's quantizer registry
(ecc_codecs/quantization_backends.py). All backends are pure-functional jnp
and safe to call under `jit`; the registry / facade API is preserved:

    get_quantizer("kivi", QuantizationConfig(...)).quantize(x, mode)

Symmetric INT4 convention (shared with the ECC cache engine):
    scale = max|x| / 7,  q = round(x / scale) + 8, clamped to [0, 15].
KIVI asymmetric convention (KIVI paper, ICML 2024):
    zero_point = min(x), scale = (max(x) - min(x)) / (2^bits - 1),
    q = round((x - zp) / scale);  keys per-channel, values per-token.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Any, Optional

import jax.numpy as jnp


class QuantizationMode(Enum):
    KEY = "key"
    VALUE = "value"
    GENERIC = "generic"


@dataclasses.dataclass
class QuantizationConfig:
    bits: int = 4
    symmetric: bool = True
    block_size: int = 32
    group_size: Optional[int] = None
    dtype: Any = jnp.float32
    residual_length: int = 128
    channel_axis: int = -1


@dataclasses.dataclass
class QuantizedTensor:
    data: jnp.ndarray
    scales: jnp.ndarray
    zero_points: Optional[jnp.ndarray] = None
    original_shape: Optional[tuple] = None
    mode: QuantizationMode = QuantizationMode.GENERIC
    metadata: Optional[dict] = None


def _pad_last(x, multiple):
    n = x.shape[-1]
    pad = (multiple - n % multiple) % multiple
    if pad:
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        x = jnp.pad(x, cfg)
    return x, pad


class QuantizerBackend:
    """Base class: INT4 with zero-point 8 (symmetric backends)."""

    QMIN = 0
    QMAX = 15
    ZERO_POINT = 8

    def __init__(self, config: Optional[QuantizationConfig] = None):
        self.config = config or QuantizationConfig()

    @property
    def name(self):
        return self.__class__.__name__

    # subclasses implement quantize/dequantize


class BlockAbsmaxQuantizer(QuantizerBackend):
    """Per-block symmetric absmax over the last dimension (the default)."""

    def quantize(self, x, mode=QuantizationMode.GENERIC):
        x = jnp.asarray(x)
        original_shape = x.shape
        block = self.config.block_size
        xp, pad = _pad_last(x, block)
        grouped = xp.reshape(*xp.shape[:-1], xp.shape[-1] // block, block)
        scales = jnp.clip(jnp.max(jnp.abs(grouped), axis=-1), 1e-8, None) / 7.0
        q = jnp.round(grouped / scales[..., None]) + self.ZERO_POINT
        q = jnp.clip(q, self.QMIN, self.QMAX).astype(jnp.uint8)
        q = q.reshape(*xp.shape[:-1], -1)
        if pad:
            q = q[..., :-pad]
        return QuantizedTensor(
            data=q.reshape(original_shape),
            scales=scales,
            original_shape=original_shape,
            mode=mode,
            metadata={"block_size": block, "pad_size": pad},
        )

    def dequantize(self, qt: QuantizedTensor):
        block = (qt.metadata or {}).get("block_size", self.config.block_size)
        q = jnp.asarray(qt.data)
        qp, pad = _pad_last(q, block)
        grouped = qp.reshape(*qt.scales.shape, block).astype(self.config.dtype)
        x = (grouped - self.ZERO_POINT) * qt.scales[..., None]
        x = x.reshape(*qp.shape[:-1], -1)
        if pad:
            x = x[..., :-pad]
        return x.reshape(q.shape).astype(self.config.dtype)


class PerTokenQuantizer(QuantizerBackend):
    """One symmetric scale per position along the last axis reduction
    (good for the value cache, per the KIVI paper)."""

    def quantize(self, x, mode=QuantizationMode.GENERIC):
        x = jnp.asarray(x)
        scales = jnp.clip(jnp.max(jnp.abs(x), axis=-1), 1e-8, None) / 7.0
        q = jnp.round(x / scales[..., None]) + self.ZERO_POINT
        q = jnp.clip(q, self.QMIN, self.QMAX).astype(jnp.uint8)
        return QuantizedTensor(
            data=q, scales=scales, original_shape=x.shape, mode=mode
        )

    def dequantize(self, qt: QuantizedTensor):
        return (
            (jnp.asarray(qt.data).astype(self.config.dtype) - self.ZERO_POINT)
            * qt.scales[..., None]
        ).astype(self.config.dtype)


class PerChannelQuantizer(QuantizerBackend):
    """One symmetric scale per channel (last axis), reducing over all leading
    dims (good for the key cache - keys carry fixed-channel outliers)."""

    def quantize(self, x, mode=QuantizationMode.GENERIC):
        x = jnp.asarray(x)
        reduce_axes = tuple(range(x.ndim - 1))
        scales = jnp.clip(jnp.max(jnp.abs(x), axis=reduce_axes), 1e-8, None) / 7.0
        q = jnp.round(x / scales) + self.ZERO_POINT
        q = jnp.clip(q, self.QMIN, self.QMAX).astype(jnp.uint8)
        return QuantizedTensor(
            data=q, scales=scales, original_shape=x.shape, mode=mode
        )

    def dequantize(self, qt: QuantizedTensor):
        return (
            (jnp.asarray(qt.data).astype(self.config.dtype) - self.ZERO_POINT)
            * qt.scales
        ).astype(self.config.dtype)


class KIVIQuantizer(QuantizerBackend):
    """KIVI asymmetric quantization (keys per-channel, values per-token).

    Q(X) = round((X - zp) / s), zp = min(X), s = (max(X) - min(X)) / (2^B - 1),
    grouped at group_size (default 32), bits configurable (default 4 here for
    ECC compatibility vs 2 in the paper).
    """

    def __init__(self, config=None):
        super().__init__(config)
        self.group_size = self.config.group_size or 32
        self.bits = self.config.bits
        self.qmax = (1 << self.bits) - 1

    def _quantize_per_token(self, x):
        xp, pad = _pad_last(x, self.group_size)
        g = xp.reshape(*xp.shape[:-1], xp.shape[-1] // self.group_size, self.group_size)
        x_min = jnp.min(g, axis=-1)
        x_max = jnp.max(g, axis=-1)
        scales = jnp.clip((x_max - x_min) / self.qmax, 1e-8, None)
        q = jnp.round((g - x_min[..., None]) / scales[..., None])
        q = jnp.clip(q, 0, self.qmax).astype(jnp.uint8)
        q = q.reshape(*xp.shape[:-1], -1)
        if pad:
            q = q[..., :-pad]
        return q.reshape(x.shape), scales, x_min

    def _quantize_per_channel(self, x):
        xp, pad = _pad_last(x, self.group_size)
        n_groups = xp.shape[-1] // self.group_size
        flat = xp.reshape(-1, n_groups, self.group_size)
        x_min = jnp.min(flat, axis=(0, 2))
        x_max = jnp.max(flat, axis=(0, 2))
        scales = jnp.clip((x_max - x_min) / self.qmax, 1e-8, None)
        q = jnp.round((flat - x_min[None, :, None]) / scales[None, :, None])
        q = jnp.clip(q, 0, self.qmax).astype(jnp.uint8)
        q = q.reshape(*xp.shape[:-1], -1)
        if pad:
            q = q[..., :-pad]
        return q.reshape(x.shape), scales, x_min

    def quantize(self, x, mode=QuantizationMode.GENERIC):
        x = jnp.asarray(x)
        per_channel = mode == QuantizationMode.KEY
        if per_channel:
            q, scales, zps = self._quantize_per_channel(x)
        else:
            q, scales, zps = self._quantize_per_token(x)
        return QuantizedTensor(
            data=q,
            scales=scales,
            zero_points=zps,
            original_shape=x.shape,
            mode=mode,
            metadata={
                "per_channel": per_channel,
                "group_size": self.group_size,
                "bits": self.bits,
            },
        )

    def dequantize(self, qt: QuantizedTensor):
        per_channel = (qt.metadata or {}).get("per_channel", False)
        q = jnp.asarray(qt.data).astype(self.config.dtype)
        qp, pad = _pad_last(q, self.group_size)
        if per_channel:
            n_groups = qt.scales.shape[0]
            flat = qp.reshape(-1, n_groups, self.group_size)
            x = flat * qt.scales[None, :, None] + qt.zero_points[None, :, None]
            x = x.reshape(*qp.shape[:-1], -1)
        else:
            g = qp.reshape(*qt.scales.shape, self.group_size)
            x = g * qt.scales[..., None] + qt.zero_points[..., None]
            x = x.reshape(*qp.shape[:-1], -1)
        if pad:
            x = x[..., :-pad]
        return x.reshape(q.shape).astype(self.config.dtype)

    def quantize_kv(self, keys, values):
        return (
            self.quantize(keys, QuantizationMode.KEY),
            self.quantize(values, QuantizationMode.VALUE),
        )

    def dequantize_kv(self, q_keys, q_values):
        return self.dequantize(q_keys), self.dequantize(q_values)


class KIVISymmetricQuantizer(QuantizerBackend):
    """KIVI strategy selection (keys per-channel / values per-token) with
    symmetric zero-point-8 quantization, for ECC compatibility."""

    def __init__(self, config=None):
        super().__init__(config)
        self.per_channel = PerChannelQuantizer(config)
        self.per_token = PerTokenQuantizer(config)

    def quantize(self, x, mode=QuantizationMode.GENERIC):
        if mode == QuantizationMode.KEY:
            return self.per_channel.quantize(x, mode)
        return self.per_token.quantize(x, mode)

    def dequantize(self, qt: QuantizedTensor):
        if qt.mode == QuantizationMode.KEY:
            return self.per_channel.dequantize(qt)
        return self.per_token.dequantize(qt)

    def quantize_kv(self, keys, values):
        return (
            self.quantize(keys, QuantizationMode.KEY),
            self.quantize(values, QuantizationMode.VALUE),
        )

    def dequantize_kv(self, q_keys, q_values):
        return self.dequantize(q_keys), self.dequantize(q_values)


class GroupWiseQuantizer(QuantizerBackend):
    """Symmetric group-wise quantization (GPTQ-style granularity)."""

    def quantize(self, x, mode=QuantizationMode.GENERIC):
        x = jnp.asarray(x)
        group = self.config.group_size or 128
        original_shape = x.shape
        xp, pad = _pad_last(x, group)
        g = xp.reshape(*xp.shape[:-1], xp.shape[-1] // group, group)
        scales = jnp.clip(jnp.max(jnp.abs(g), axis=-1), 1e-8, None) / 7.0
        q = jnp.round(g / scales[..., None]) + self.ZERO_POINT
        q = jnp.clip(q, self.QMIN, self.QMAX).astype(jnp.uint8)
        q = q.reshape(*xp.shape[:-1], -1)
        if pad:
            q = q[..., :-pad]
        return QuantizedTensor(
            data=q.reshape(original_shape),
            scales=scales,
            original_shape=original_shape,
            mode=mode,
            metadata={"group_size": group, "pad_size": pad},
        )

    def dequantize(self, qt: QuantizedTensor):
        group = (qt.metadata or {}).get("group_size", self.config.group_size or 128)
        q = jnp.asarray(qt.data)
        qp, pad = _pad_last(q, group)
        g = qp.reshape(*qt.scales.shape, group).astype(self.config.dtype)
        x = (g - self.ZERO_POINT) * qt.scales[..., None]
        x = x.reshape(*qp.shape[:-1], -1)
        if pad:
            x = x[..., :-pad]
        return x.reshape(q.shape).astype(self.config.dtype)


QUANTIZER_BACKENDS = {
    "block_absmax": BlockAbsmaxQuantizer,
    "per_token": PerTokenQuantizer,
    "per_channel": PerChannelQuantizer,
    "kivi": KIVIQuantizer,
    "kivi_symmetric": KIVISymmetricQuantizer,
    "group_wise": GroupWiseQuantizer,
}


def get_quantizer(name: str, config: Optional[QuantizationConfig] = None):
    if name not in QUANTIZER_BACKENDS:
        raise ValueError(
            f"Unknown quantizer backend '{name}'. "
            f"Available: {sorted(QUANTIZER_BACKENDS)}"
        )
    return QUANTIZER_BACKENDS[name](config)


def quantize_kv_cache(keys, values, backend="kivi_symmetric", config=None):
    """Quantize K and V with the KIVI-style mode split."""
    quantizer = get_quantizer(backend, config)
    qk = quantizer.quantize(keys, QuantizationMode.KEY)
    qv = quantizer.quantize(values, QuantizationMode.VALUE)
    return qk, qv, quantizer


def dequantize_kv_cache(qk, qv, quantizer):
    return quantizer.dequantize(qk), quantizer.dequantize(qv)


# =============================================================================
# Facade: reference-compatible (q, scales) API
# =============================================================================


class INT4Quantizer:
    """Backward-compatible facade over the backend registry
    (reference ecc_codecs/quantization.py:33)."""

    QMIN = 0
    QMAX = 15
    ZERO_POINT = 8

    def __init__(self, block_size: int = 32, backend: str = "block_absmax"):
        self.block_size = block_size
        self.backend_name = backend
        self._backend = None

    @property
    def backend(self):
        if self._backend is None:
            self._backend = get_quantizer(
                self.backend_name, QuantizationConfig(block_size=self.block_size)
            )
        return self._backend

    def quantize_full(self, x):
        qt = self.backend.quantize(jnp.asarray(x))
        return qt.data, qt.scales

    def dequantize_full(self, q, scales):
        qt = QuantizedTensor(data=q, scales=scales)
        return self.backend.dequantize(qt)

    def quantize_kv(self, x):
        """Per-position (last-dim) symmetric quantization used by the ECC
        cache write path: scale = max|x|/7 with a floor of 1.0 when the row is
        all zeros (reference paged_cache_ecc.py:302-335)."""
        x = jnp.asarray(x, dtype=jnp.float32)
        scales = compute_quantization_scales(x)
        q = jnp.clip(jnp.round(x / scales[..., None]), -8, 7) + 8
        return q.astype(jnp.uint8), scales

    def dequantize_kv(self, q, scales):
        return (jnp.asarray(q).astype(jnp.float32) - 8.0) * scales[..., None]


class INT4QuantizerSimple(INT4Quantizer):
    """Alias kept for API parity with the reference."""


def compute_quantization_scales(tensor, axis=-1):
    """Per-position absmax scales: scale = max|x| / 7, zero rows -> 1.0
    (reference kv_cache/paged_cache_ecc.py:302)."""
    abs_max = jnp.max(jnp.abs(jnp.asarray(tensor, dtype=jnp.float32)), axis=axis)
    scales = abs_max / 7.0
    return jnp.where(scales == 0, 1.0, scales)
