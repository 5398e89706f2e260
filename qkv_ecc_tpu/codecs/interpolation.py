"""Manifold interpolation for SECDED double-error recovery.

When Hamming(8,4) detects a double error (uncorrectable), the corrupted INT4
value at sequence position t is replaced by the rounded average of its
temporal neighbors:

    v_hat[t] = round((v[t-1] + v[t+1]) / 2), boundary-clamped, clipped to
    [0, 15].

Matches the reference kernel exactly (ecc_codecs/triton_kernels/
interpolation_triton.py:120-260): neighbors are the *decoded* values
regardless of their own error state, rounding is round-half-up
(floor(x + 0.5)), and interpolation happens in INT4 code space (the
corrupted token's own dequantization scale is applied afterwards by the
caller).
"""

from __future__ import annotations

import jax.numpy as jnp

from .algebra import ErrorType


def interpolate_double_errors(q, error_type, seq_dim=-1):
    """Replace DOUBLE_DETECTED positions by neighbor interpolation.

    Args:
        q: decoded INT4 values (uint8, 0-15), any shape.
        error_type: ErrorType classification, same shape.
        seq_dim: dimension along which "temporal neighbors" live.

    Returns:
        uint8 array of the same shape; non-error positions untouched.
    """
    q = jnp.asarray(q)
    error_type = jnp.asarray(error_type)
    if q.shape != error_type.shape:
        raise ValueError(f"shape mismatch: {q.shape} vs {error_type.shape}")

    if q.ndim == 0:
        return q

    axis = seq_dim % q.ndim
    moved = jnp.moveaxis(q, axis, -1)
    moved_err = jnp.moveaxis(error_type, axis, -1)
    n = moved.shape[-1]

    if n == 1:
        # Degenerate sequence: left==right==self, interpolation is identity
        # modulo rounding of (2v)/2.
        left = right = moved
    else:
        left = jnp.concatenate([moved[..., :1], moved[..., :-1]], axis=-1)
        right = jnp.concatenate([moved[..., 1:], moved[..., -1:]], axis=-1)

    interp = (left.astype(jnp.float32) + right.astype(jnp.float32)) * 0.5
    # round-half-up then clamp to the INT4 range, as the reference kernel does
    # (max(0, min(15, x + 0.5)) followed by a truncating cast).
    interp = jnp.clip(jnp.floor(interp + 0.5), 0.0, 15.0).astype(jnp.uint8)

    out = jnp.where(moved_err == ErrorType.DOUBLE_DETECTED, interp, moved)
    return jnp.moveaxis(out, -1, axis)
