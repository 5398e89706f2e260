"""Interpolation tests (mirrors reference tests/test_triton_interpolation.py):
boundary handling, scattered/consecutive errors, batch independence, seq_dim
permutation, and end-to-end with Hamming(8,4)."""

import numpy as np
import jax.numpy as jnp

from qkv_ecc_tpu.codecs import ErrorType, interpolate_double_errors

D = ErrorType.DOUBLE_DETECTED


def test_no_errors_identity():
    q = jnp.asarray([1, 2, 3, 4], dtype=jnp.uint8)
    et = jnp.zeros(4, dtype=jnp.uint8)
    assert jnp.array_equal(interpolate_double_errors(q, et), q)


def test_middle_error():
    q = jnp.asarray([4, 15, 8], dtype=jnp.uint8)
    et = jnp.asarray([0, D, 0], dtype=jnp.uint8)
    out = interpolate_double_errors(q, et)
    assert int(out[1]) == 6  # (4+8)/2
    assert int(out[0]) == 4 and int(out[2]) == 8


def test_round_half_up():
    q = jnp.asarray([4, 0, 9], dtype=jnp.uint8)
    et = jnp.asarray([0, D, 0], dtype=jnp.uint8)
    out = interpolate_double_errors(q, et)
    assert int(out[1]) == 7  # (4+9)/2 = 6.5 -> 7 (round half up)


def test_boundaries_clamped():
    q = jnp.asarray([9, 3, 5, 11], dtype=jnp.uint8)
    et = jnp.asarray([D, 0, 0, D], dtype=jnp.uint8)
    out = interpolate_double_errors(q, et)
    # left boundary: avg(q[0], q[1]) = (9+3)/2 = 6
    assert int(out[0]) == 6
    # right boundary: avg(q[2], q[3]) = (5+11)/2 = 8
    assert int(out[3]) == 8


def test_consecutive_errors_use_decoded_neighbors():
    q = jnp.asarray([2, 10, 12, 6], dtype=jnp.uint8)
    et = jnp.asarray([0, D, D, 0], dtype=jnp.uint8)
    out = interpolate_double_errors(q, et)
    # neighbors are the raw decoded values, even if themselves erroneous
    assert int(out[1]) == 7  # (2+12)/2
    assert int(out[2]) == 8  # (10+6)/2


def test_batch_rows_independent():
    q = jnp.asarray([[0, 8, 0], [15, 1, 15]], dtype=jnp.uint8)
    et = jnp.asarray([[0, D, 0], [0, D, 0]], dtype=jnp.uint8)
    out = interpolate_double_errors(q, et, seq_dim=-1)
    assert int(out[0, 1]) == 0
    assert int(out[1, 1]) == 15


def test_seq_dim_zero():
    """Interpolation along axis 0 (the temporal layout used by the engine:
    [ctx_len, kv_heads, head_dim], reference ecc_shim.py:1049-1059)."""
    q = np.zeros((5, 2, 3), dtype=np.uint8)
    q[1, 0, 0] = 9
    q[0, 0, 0] = 3
    q[2, 0, 0] = 7
    et = np.zeros_like(q)
    et[1, 0, 0] = D
    out = interpolate_double_errors(jnp.asarray(q), jnp.asarray(et), seq_dim=0)
    assert int(out[1, 0, 0]) == 5  # (3+7)/2
    assert int(out[1, 1, 0]) == 0  # untouched lane


def test_clamps_to_int4_range():
    q = jnp.asarray([15, 0, 15], dtype=jnp.uint8)
    et = jnp.asarray([0, D, 0], dtype=jnp.uint8)
    out = interpolate_double_errors(q, et)
    assert 0 <= int(out[1]) <= 15


def test_end_to_end_hamming84_double_error_recovery():
    """Inject an exact double error, decode, interpolate, and confirm the
    recovered value is the neighbor average rather than garbage
    (reference test_triton_interpolation.py:296-355)."""
    from qkv_ecc_tpu.codecs import hamming84_decode, hamming84_encode

    vals = jnp.asarray([6, 9, 7], dtype=jnp.uint8)
    cw = hamming84_encode(vals)
    corrupted = cw.at[1].set(cw[1] ^ jnp.uint8(0b101))  # two flips at pos 1
    data, et, _, detected = hamming84_decode(corrupted)
    assert int(detected) == 1
    out = interpolate_double_errors(data, et)
    assert int(out[1]) == 7  # round((6+7)/2 + .5) = 7 (round half up of 6.5)
    assert int(out[0]) == 6 and int(out[2]) == 7
