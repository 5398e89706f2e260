"""Deterministic Bernoulli bit-flip fault injection on the JAX counter-based
PRNG (threefry).

TPU-native equivalent of the reference's Triton injection kernels
(ecc_codecs/triton_kernels/fault_injection_triton.py). Semantics:

    - Each of the lower `n_bits` bits of every element is flipped
      independently with probability `ber`.
    - Determinism contract: a fixed (seed, shape, n_bits) always produces the
      identical flip pattern (the reference's contract, fault_injection
      _triton.py:247; bit-identical patterns across *implementations* are not
      required - only statistical equivalence, which is what the Monte-Carlo
      PPL tables measure).
    - Statistics: (total_flips, elements_affected), as in the reference's
      return_stats=True path.

The threefry counter-based generator means injection is reproducible under
jit, vmap, and sharding - no RNG state threading.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _flip_mask(key: jax.Array, shape, ber, n_bits: int, dtype) -> jax.Array:
    """Random XOR mask: bit b of each element set with probability `ber`."""
    # One uint32 draw per (element, bit); flip when draw < ber * 2^32.
    draws = jax.random.bits(key, shape=(n_bits,) + tuple(shape), dtype=jnp.uint32)
    if isinstance(ber, (int, float)):
        threshold = jnp.uint32(min(int(ber * (2.0**32)), 0xFFFFFFFF))
    else:
        # traced BER (inside jit): float32 threshold, ~1e-7 relative rounding
        threshold = jnp.minimum(
            jnp.asarray(ber, jnp.float32) * jnp.float32(2.0**32),
            jnp.float32(2.0**32 - 1024),
        ).astype(jnp.uint32)
    flips = (draws < threshold).astype(jnp.int32)
    # disjoint bit planes: sum == or, and the vectorized [n_bits] shift
    # keeps the dependency chain flat (the write path is latency-bound on
    # tiny per-layer tensors during decode)
    bits = jnp.arange(n_bits, dtype=jnp.int32).reshape(
        (n_bits,) + (1,) * len(tuple(shape)))
    return (flips << bits).sum(0)


@partial(jax.jit, static_argnames=("ber", "n_bits"))
def _inject_jit(data: jax.Array, key: jax.Array, ber: float, n_bits: int):
    mask = _flip_mask(key, data.shape, ber, n_bits, data.dtype)
    corrupted = (data.astype(jnp.int32) ^ mask).astype(data.dtype)
    per_elem_flips = jax.lax.population_count(mask)
    total_flips = jnp.sum(per_elem_flips, dtype=jnp.int32)
    elements_affected = jnp.sum(mask != 0, dtype=jnp.int32)
    return corrupted, total_flips, elements_affected


def inject_bit_errors(data, ber, n_bits, seed=0, key=None, return_stats=False):
    """Inject Bernoulli bit flips at the given BER.

    Args:
        data: uint8 or int32 array of codewords.
        ber: bit error rate in [0, 1].
        n_bits: number of low-order bits subject to flips (4/7/8/24).
        seed: integer seed (used when `key` is None).
        key: optional jax PRNG key; takes precedence over `seed`.
        return_stats: also return (total_flips, elements_affected).

    Returns:
        corrupted array, or (corrupted, (total_flips, elements_affected)).
    """
    data = jnp.asarray(data)
    if ber <= 0:
        return (data, (0, 0)) if return_stats else data
    if key is None:
        key = jax.random.key(seed)
    corrupted, total_flips, affected = _inject_jit(data, key, float(ber), int(n_bits))
    if return_stats:
        return corrupted, (int(total_flips), int(affected))
    return corrupted


def flip_mask_for(key, shape, ber, n_bits):
    """Expose the raw XOR mask (used by the fused write path, where the mask
    is applied inside a larger jitted computation and stats are accumulated
    as traced values)."""
    return _flip_mask(key, shape, ber, n_bits, jnp.int32)


def verify_ber_fidelity(ber=0.01, n_bits=8, n=1_000_000, seed=0, tolerance=0.15):
    """Empirical BER must match target within relative tolerance
    (reference fault_injection_triton.py:499)."""
    data = jnp.zeros((n,), dtype=jnp.uint8 if n_bits <= 8 else jnp.int32)
    _, (flips, _) = inject_bit_errors(data, ber, n_bits, seed=seed, return_stats=True)
    empirical = flips / (n * n_bits)
    return abs(empirical - ber) <= tolerance * ber, empirical


def verify_determinism(ber=0.01, n_bits=8, n=4096, seed=123):
    """Same seed -> identical corruption; different seed -> different
    (reference fault_injection_triton.py:527)."""
    data = jnp.arange(n, dtype=jnp.int32) % 256
    data = data.astype(jnp.uint8)
    a = inject_bit_errors(data, ber, n_bits, seed=seed)
    b = inject_bit_errors(data, ber, n_bits, seed=seed)
    c = inject_bit_errors(data, ber, n_bits, seed=seed + 1)
    same = bool(jnp.array_equal(a, b))
    different = not bool(jnp.array_equal(a, c))
    return same and different
