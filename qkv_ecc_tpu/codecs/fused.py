"""Fused quantize+encode and decode+dequantize ops.

TPU-native equivalent of the reference's fused Triton kernels
(ecc_codecs/triton_kernels/fused_kernels.py). On TPU these are expressed as
jnp chains that XLA fuses into single VPU loops under jit; dedicated Pallas
versions for the paged-cache hot path live in qkv_ecc_tpu/kernels/.

Semantics (matching the reference):
    - fused_quantize_encode_*: per-row absmax -> scale = absmax/7 ->
      q = round(x/scale) + 8 clamped to [0,15] -> inline Hamming encode.
      Zero rows get scale 1.0.
    - fused_decode_dequantize_hamming84: inline SECDED decode ->
      (q - 8) * scale. NOTE: like the reference fused kernel (and unlike the
      standalone decoder), double errors are ZEROED here
      (fused_kernels.py:344); the standalone path preserves them.
"""

from __future__ import annotations

import jax.numpy as jnp

from .algebra import ErrorType
from .quantizers import compute_quantization_scales
from .reference import (
    hamming74_encode,
    hamming74_decode,
    hamming84_encode,
    hamming84_decode,
)


def _quantize_rows(x):
    x = jnp.asarray(x, dtype=jnp.float32)
    scales = compute_quantization_scales(x, axis=-1)
    q = jnp.clip(jnp.round(x / scales[..., None]), -8, 7) + 8
    return q.astype(jnp.uint8), scales


def fused_quantize_encode_hamming84(x):
    """float rows -> (codewords uint8, scales) with one fused pass."""
    q, scales = _quantize_rows(x)
    return hamming84_encode(q), scales


def fused_quantize_encode_hamming74(x):
    q, scales = _quantize_rows(x)
    return hamming74_encode(q), scales


def fused_decode_dequantize_hamming84(codewords, scales):
    """codewords + per-row scales -> (float rows, (corrected, detected)).

    Double errors are zeroed in this fused path (reference
    fused_kernels.py:344) - the value contributes 0-centered (-8*scale)...
    the reference stores q=0 then dequantizes, giving (0-8)*scale; we mirror
    that exactly.
    """
    data, error_type, corrected, detected = hamming84_decode(codewords)
    data = jnp.where(error_type == ErrorType.DOUBLE_DETECTED, 0, data)
    x = (data.astype(jnp.float32) - 8.0) * jnp.asarray(scales)[..., None]
    return x, (corrected, detected)


def fused_decode_dequantize_hamming74(codewords, scales):
    data, _err, corrected = hamming74_decode(codewords)
    x = (data.astype(jnp.float32) - 8.0) * jnp.asarray(scales)[..., None]
    return x, (corrected,)
