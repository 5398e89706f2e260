"""Elementwise Pallas TPU kernels for the ECC codecs.

TPU-native equivalents of the reference's standalone Triton codec kernels
(ecc_codecs/triton_kernels/{hamming74,hamming84,golay}_triton.py). Each kernel
processes a 2D tile of codewords per grid step; inputs of any shape are
flattened and padded to tile boundaries by the wrappers.

These kernels are memory-bound bit manipulation: the tile sizes are chosen so
each grid step moves >= 512 KB through VMEM, which saturates HBM bandwidth on
v5e/v5p. The same inline decode routines (kernels/common.py) are reused by the
fused paged-attention kernel, so differential tests here also validate the
attention kernel's decode stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codecs.algebra import GOLAY_B_ROW_MASKS
from . import common as C

_LANES = 512  # lane-dim tile (multiple of 128)
_SUBLANES = 256  # sublane-dim tile

_B_MASKS = tuple(int(m) for m in GOLAY_B_ROW_MASKS)


def _tile_call(kernel_fn, x, out_dtypes, extra_outs=0, sublanes=_SUBLANES):
    """Run an elementwise kernel over flattened, padded 2D view(s) of x.

    x may be a single array or a tuple of same-shape arrays (multi-input
    elementwise kernels, e.g. codeword + injection mask)."""
    xs = x if isinstance(x, (tuple, list)) else (x,)
    orig_shape = xs[0].shape
    n = xs[0].size
    if n == 0:
        outs = [jnp.zeros(orig_shape, dt) for dt in out_dtypes]
        return outs[0] if len(outs) == 1 else tuple(outs)

    cols = _LANES
    rows = C.cdiv(n, cols)
    rows_padded = C.round_up(max(rows, 1), 8)
    x2ds = tuple(
        jnp.pad(jnp.ravel(a), (0, rows_padded * cols - n)).reshape(
            rows_padded, cols
        )
        for a in xs
    )

    bm = min(sublanes, rows_padded)
    grid = (C.cdiv(rows_padded, bm),)

    out_shapes = tuple(
        jax.ShapeDtypeStruct((rows_padded, cols), dt) for dt in out_dtypes
    )
    outs = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in xs
        ],
        out_specs=tuple(
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in out_dtypes
        ),
        out_shape=out_shapes,
        interpret=C.use_interpret(),
    )(*x2ds)
    if not isinstance(outs, (tuple, list)):
        outs = (outs,)
    results = tuple(o.reshape(-1)[:n].reshape(orig_shape) for o in outs)
    return results[0] if len(results) == 1 else results


# =============================================================================
# Hamming(7,4)
# =============================================================================


def _h74_encode_kernel(x_ref, out_ref):
    d = x_ref[:].astype(jnp.int32)
    out_ref[:] = C.hamming74_encode_i32(d).astype(jnp.uint8)


def _h74_decode_kernel(x_ref, data_ref, err_ref):
    cw = x_ref[:].astype(jnp.int32)
    data, err = C.hamming74_decode_i32(cw)
    data_ref[:] = data.astype(jnp.uint8)
    err_ref[:] = err.astype(jnp.uint8)


@jax.jit
def hamming74_encode_tpu(values):
    """Pallas Hamming(7,4) encode: uint8 nibbles -> uint8 codewords."""
    return _tile_call(_h74_encode_kernel, jnp.asarray(values, jnp.uint8), [jnp.uint8])


@jax.jit
def hamming74_decode_tpu(codewords):
    """Pallas Hamming(7,4) decode -> (data, error_detected_u8)."""
    return _tile_call(
        _h74_decode_kernel, jnp.asarray(codewords, jnp.uint8), [jnp.uint8, jnp.uint8]
    )


# =============================================================================
# Hamming(8,4) SECDED
# =============================================================================


def _h84_encode_kernel(x_ref, out_ref):
    d = x_ref[:].astype(jnp.int32)
    out_ref[:] = C.hamming84_encode_i32(d).astype(jnp.uint8)


def _h84_decode_kernel(x_ref, data_ref, et_ref):
    cw = x_ref[:].astype(jnp.int32)
    data, error_type = C.hamming84_decode_i32(cw)
    data_ref[:] = data.astype(jnp.uint8)
    et_ref[:] = error_type.astype(jnp.uint8)


@jax.jit
def hamming84_encode_tpu(values):
    """Pallas Hamming(8,4) SECDED encode."""
    return _tile_call(_h84_encode_kernel, jnp.asarray(values, jnp.uint8), [jnp.uint8])


@jax.jit
def hamming84_decode_tpu(codewords):
    """Pallas Hamming(8,4) SECDED decode -> (data, error_type)."""
    return _tile_call(
        _h84_decode_kernel, jnp.asarray(codewords, jnp.uint8), [jnp.uint8, jnp.uint8]
    )


# =============================================================================
# Golay(24,12)
# =============================================================================


def _golay_encode_kernel(x_ref, out_ref):
    out_ref[:] = C.golay_encode_i32(x_ref[:] & 0xFFF, _B_MASKS)


def _golay_decode_kernel(x_ref, data_ref, cnt_ref):
    data, cnt = C.golay_decode_i32(x_ref[:], _B_MASKS, zero_uncorrectable=False)
    data_ref[:] = data
    cnt_ref[:] = cnt


@functools.partial(jax.jit, static_argnames=("sublanes",))
def golay_encode_packed_tpu(data12, sublanes: int = 64):
    """Pallas Golay encode: int32 12-bit data words -> 24-bit codewords."""
    return _tile_call(
        _golay_encode_kernel, jnp.asarray(data12, jnp.int32), [jnp.int32],
        sublanes=sublanes,
    )


@functools.partial(jax.jit, static_argnames=("sublanes",))
def golay_decode_packed_tpu(codewords, sublanes: int = 64):
    """Pallas Golay decode -> (data12, error_count 0-3 or sentinel 4).

    Uses the arithmetic IMLD decoder: unlike the reference (which could not
    fit the 4096-entry LUT gather into its fused kernels and fell back to
    Python for Golay, attention_ecc.py:759-775), the TPU decoder is pure
    XOR/popcount/select vector ops. `sublanes` sets the grid tile height
    (compute-bound kernel; see scripts/codec_tile_probe.py).
    """
    return _tile_call(
        _golay_decode_kernel, jnp.asarray(codewords, jnp.int32),
        [jnp.int32, jnp.int32], sublanes=sublanes,
    )


def _golay_write_scrub_kernel(d_ref, m_ref, out_ref):
    cw = C.golay_encode_i32(d_ref[:] & 0xFFF, _B_MASKS) ^ m_ref[:]
    out_ref[:] = C.golay_encode_i32(
        C.golay_correct_data_i32(cw, _B_MASKS), _B_MASKS
    )


@jax.jit
def golay_write_scrub_tpu(data12, flip_mask):
    """Fused golay write-path transform in ONE Pallas launch:
    encode -> XOR the injected fault mask -> IMLD data correction
    (uncorrectable -> 0) -> re-encode, i.e.

        scrub_codewords("golay", golay_encode_wide(data12) ^ flip_mask)

    bit-for-bit (tests/test_codecs.py). Exists because the per-layer jnp
    chain is FUSION-LAUNCH-bound on decode-step tensors ([B, 1, Hkv, C4]
    per layer, 24 strictly serial layers): measured ~2.5-3 ms/step of pure
    tiny-op overhead vs the unprotected int4 write chain, while this
    kernel's ~300-op serial VPU chain runs in ~1-2 us per launch. The
    threefry mask stays OUTSIDE (jnp flip_mask_for), so the injection
    stream is identical to the unfused path.

    SUPERSEDED in the runtimes (round 4) by the scrub-FOLDED mask design
    (kernels/swar.py:scrub_fold_mask): the correction depends only on the
    mask, so the hoisted bulk draw pre-folds it and the per-layer write is
    plain quantize -> xor delta -> encode -> pack with no kernel launch.
    Kept as the standalone fused form (and its differential test)."""
    return _tile_call(
        _golay_write_scrub_kernel,
        (jnp.asarray(data12, jnp.int32), jnp.asarray(flip_mask, jnp.int32)),
        [jnp.int32],
        sublanes=64,
    )


def golay_encode_tpu(nibbles):
    """Triplets [..., 3] -> int32 codewords [...] via the Pallas kernel."""
    from ..codecs.reference import golay_pack

    return golay_encode_packed_tpu(golay_pack(nibbles))


def golay_decode_tpu(codewords):
    """int32 codewords [...] -> (triplets [..., 3], error_count [...])."""
    from ..codecs.reference import golay_unpack

    data12, cnt = golay_decode_packed_tpu(codewords)
    return golay_unpack(data12), cnt


# =============================================================================
# Fault injection (TPU hardware PRNG)
# =============================================================================


def _inject_kernel(seed_ref, x_ref, out_ref, *, n_bits, threshold):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.int32)
    mask = jnp.zeros_like(x)
    for b in range(n_bits):
        draws = pltpu.prng_random_bits(x.shape)
        flip = (draws.astype(jnp.uint32) < jnp.uint32(threshold)).astype(jnp.int32)
        mask = mask | (flip << b)
    out_ref[:] = x ^ mask


@functools.partial(jax.jit, static_argnames=("ber", "n_bits"))
def inject_bit_errors_tpu(data, ber, n_bits, seed):
    """Bernoulli bit flips using the on-chip PRNG (pltpu.prng_random_bits).

    Deterministic for a fixed (seed, shape) on a given backend. This is the
    in-kernel injection path; the threefry-based
    codecs.fault_injection.inject_bit_errors remains the portable reference.
    """
    data = jnp.asarray(data)
    orig_dtype = data.dtype
    orig_shape = data.shape
    n = data.size
    if n == 0 or ber <= 0:
        return data
    if C.use_interpret():
        # pltpu.prng_seed has no CPU lowering; use the portable threefry
        # implementation off-TPU (same contract, different bit pattern).
        from ..codecs.fault_injection import inject_bit_errors

        return inject_bit_errors(data, ber, n_bits, seed=seed)
    threshold = min(int(float(ber) * (2.0**32)), 0xFFFFFFFF)

    cols = _LANES
    rows = C.round_up(C.cdiv(n, cols), 8)
    flat = jnp.pad(jnp.ravel(data).astype(jnp.int32), (0, rows * cols - n))
    x2d = flat.reshape(rows, cols)
    bm = min(_SUBLANES, rows)

    out = pl.pallas_call(
        functools.partial(_inject_kernel, n_bits=int(n_bits), threshold=threshold),
        grid=(C.cdiv(rows, bm),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int32),
        interpret=C.use_interpret(),
    )(jnp.asarray([seed], jnp.int32), x2d)
    return out.reshape(-1)[:n].reshape(orig_shape).astype(orig_dtype)
