"""KV-cache protection policy: the codec treatment applied to K/V tensors.

This is the TPU-first replacement for the reference's per-layer
write-then-read through the paged cache during prefill
(kv_cache/ecc_shim.py:458-1089): writing S tokens and immediately decoding
the same S tokens is mathematically a ROUNDTRIP through
quantize -> encode -> inject -> decode -> (interpolate) -> dequantize, so the
prefill/PPL path applies the codec chain directly to the K/V activations
(XLA fuses the whole chain); the paged cache is only materialized when
tokens must persist across steps (generation - see models/runtime.py).
Error statistics are identical to the reference's attend-time accounting.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..codecs.algebra import GOLAY_B_ROW_MASKS
from ..codecs.fault_injection import flip_mask_for
from ..codecs.interpolation import interpolate_double_errors
from ..kernels.common import (
    hamming74_decode_i32,
    hamming74_encode_i32,
    hamming84_decode_i32,
    hamming84_encode_i32,
)
from ..kernels import swar

_B_MASKS = tuple(int(m) for m in GOLAY_B_ROW_MASKS)

N_BITS = {"int4": 4, "hamming74": 7, "hamming84": 8, "golay": 24, "fp8": 8}


@dataclasses.dataclass(frozen=True)
class KVCachePolicy:
    """Cache-mode policy (the reference's mode->codec single source of truth,
    evaluation/constants.py:157)."""

    codec: str = "fp16"
    ber: float = 0.0
    inject_errors: bool = False
    seed: int = 42
    use_interpolation: bool = False
    # Where Bernoulli flips land. "write": once, on the stored codewords
    # (the protected arms' model - errors persist in the cache). "read":
    # fresh flips on the raw INT4 nibbles at EVERY attend, the reference's
    # unprotected-arm fault model (unprotected_shim.py:276-302) - during
    # generation the same cached token is re-corrupted differently each
    # step, and actual_ber is measured over READ bits.
    inject_at: str = "write"
    # ECC patrol scrubbing (this framework's addition; DRAM-controller
    # style). The fused decode kernel corrects each dirty page ONCE, writes
    # the corrected codewords back (uncorrectable Golay -> the all-zero
    # codeword), and takes an extract-only fast path on clean pages.
    # Decoded values are bit-identical to decode-at-every-read (corrections
    # are deterministic and idempotent), but the steady-state ECC decode
    # cost drops to ~0. Automatically disabled where per-read semantics
    # matter: read-time injection, interpolation, and per-read error-stat
    # collection (see models/runtime.py use_scrub).
    scrub: bool = True

    def with_seed(self, seed: int) -> "KVCachePolicy":
        return dataclasses.replace(self, seed=seed)

    def __post_init__(self):
        if self.inject_at not in ("write", "read"):
            raise ValueError(f"inject_at must be write|read, got {self.inject_at}")
        if self.inject_at == "read" and self.codec != "int4":
            raise ValueError(
                "read-time injection models raw-nibble corruption and is "
                "only defined for the unprotected int4 arm "
                "(reference unprotected_shim.py:276)"
            )


# Mode name -> policy kwargs (reference evaluation/constants.py:157-165).
# "int4" uses READ-time injection like the reference's unprotected shim;
# "int4-write-inject" is the write-once variant (this framework's addition,
# useful as the like-for-like perf baseline for the protected arms).
MODE_CONFIG = {
    "fp16": {"codec": "fp16", "use_interpolation": False},
    "fp8": {"codec": "fp8", "use_interpolation": False},
    "int4": {"codec": "int4", "use_interpolation": False, "inject_at": "read"},
    "int4-write-inject": {"codec": "int4", "use_interpolation": False},
    "int4-hamming": {"codec": "hamming74", "use_interpolation": False},
    "int4-hamming84": {"codec": "hamming84", "use_interpolation": False},
    "int4-hamming84-interp": {"codec": "hamming84", "use_interpolation": True},
    "int12-golay": {"codec": "golay", "use_interpolation": False},
}


def policy_for_mode(mode: str, ber: float = 0.0, seed: int = 42) -> KVCachePolicy:
    if mode not in MODE_CONFIG:
        raise ValueError(f"Unknown cache mode: {mode}. Valid: {list(MODE_CONFIG)}")
    cfg = MODE_CONFIG[mode]
    return KVCachePolicy(
        codec=cfg["codec"],
        ber=ber,
        inject_errors=ber > 0,
        seed=seed,
        use_interpolation=cfg["use_interpolation"],
        inject_at=cfg.get("inject_at", "write"),
    )


def empty_stats():
    return {
        "errors_corrected": jnp.zeros((), jnp.int32),
        "errors_detected": jnp.zeros((), jnp.int32),
        "bits_flipped": jnp.zeros((), jnp.int32),
        "total_values": jnp.zeros((), jnp.int32),
    }


def _quantize(x):
    """Per-(position, head) symmetric INT4 (scale floor 1.0 on zero rows)."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(x / scale[..., None]), -8, 7) + 8
    return q.astype(jnp.int32), scale


def encode_kv(x, policy: KVCachePolicy, key, mask=None):
    """Quantize + encode + (inject) one K or V tensor [..., D].

    `mask` (optional): a PRE-DRAWN injection mask over the logical codeword
    array (any integer dtype; must equal flip_mask_for(key, enc.shape, ber,
    n_bits) bit-for-bit) - the decode loop hoists every step's draws into
    one bulk threefry chain (models/runtime.py) and passes the slices here.

    Returns (codewords, scales, flips) where codewords are int32 (fp16/fp8:
    the storage-typed values and scales=None), scales [...] float32.
    """
    codec = policy.codec
    x = jnp.asarray(x, jnp.float32)
    inject = (
        policy.inject_errors and policy.ber > 0 and policy.inject_at == "write"
    )
    flips = jnp.zeros((), jnp.int32)

    if codec == "fp16":
        return x.astype(jnp.bfloat16), None, flips
    if codec == "fp8":
        f8 = x.astype(jnp.float8_e4m3fn)
        if inject:
            raw = jax.lax.bitcast_convert_type(f8, jnp.uint8)
            if mask is None:
                mask = flip_mask_for(key, raw.shape, policy.ber, 8)
            mask = mask.astype(jnp.uint8)
            flips = jnp.sum(
                jax.lax.population_count(mask.astype(jnp.int32)), dtype=jnp.int32
            )
            f8 = jax.lax.bitcast_convert_type(raw ^ mask, jnp.float8_e4m3fn)
        return f8, None, flips

    q, scale = _quantize(x)
    head_dim = x.shape[-1]
    # per-value logical codewords, padded to the packing granularity
    # (kernels/swar.py; golay packs ADJACENT triplets like the reference,
    # ecc_shim.py:678)
    enc = swar.encode_codewords(codec, q, head_dim)

    if inject:
        if mask is None:
            mask = flip_mask_for(key, enc.shape, policy.ber, N_BITS[codec])
        mask = mask.astype(jnp.int32)
        flips = jnp.sum(jax.lax.population_count(mask), dtype=jnp.int32)
        enc = enc ^ mask
    return enc, scale, flips


def encode_kv_scrubbed(x, policy: KVCachePolicy, key, mask=None, folded=None):
    """Quantize + encode with the write-path scrub FOLDED INTO the mask.

    Round-4 design (supersedes rounds 2-3's fused scrub kernel + pre-tiled
    mask operands): for a linear code the scrub correction depends only on
    the injection mask (kernels/swar.py:scrub_fold_mask), so

        scrub_codewords(codec, encode(q) ^ mask) == encode(q ^ fold(mask))

    Bit-identical to `swar.scrub_codewords(codec, encode_kv(x)[0])` with
    the same threefry stream (tests/test_codecs.py), but the per-layer
    write chain is quantize -> xor delta -> encode -> pack for EVERY
    codec - the same chain shape as unprotected int4, with no scrub Pallas
    launch and no per-layer IMLD (golay's IMLD runs on the mask inside the
    hoisted bulk draw, hoisted_write_deltas / models/runtime.py).

    `mask`: pre-drawn logical-codeword mask (must equal flip_mask_for(key,
    <enc shape>, ber, n_bits) bit-for-bit). `folded`: pre-FOLDED delta (a
    hoisted_write_deltas slice); takes precedence over `mask`/`key`.

    Returns (scrubbed codewords, scales)."""
    codec = policy.codec
    inject = (
        policy.inject_errors and policy.ber > 0 and policy.inject_at == "write"
    )
    if codec in ("fp16", "fp8"):
        enc, scale, _ = encode_kv(x, policy, key, mask=mask)
        return enc, scale  # floats: nothing to scrub
    x = jnp.asarray(x, jnp.float32)
    q, scale = _quantize(x)
    head_dim = x.shape[-1]
    if codec == "golay":
        if inject:
            # nibble-domain folded delta (swar.scrub_fold_mask): the
            # per-layer consumption is h84-shaped uint8 elementwise work;
            # unpack_thirds/IMLD live in the bulk hoist
            if folded is None:
                if mask is None:
                    mask = flip_mask_for(
                        key,
                        q.shape[:-1]
                        + (swar.padded_values("golay", head_dim) // 3,),
                        policy.ber, N_BITS[codec],
                    )
                folded = swar.scrub_fold_mask(codec, mask)
            folded = folded.astype(jnp.int32)
            pv = swar.padded_values("golay", head_dim)
            if pv - head_dim:
                q = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, pv - head_dim)])
            q = jnp.where(
                (folded >> 4) & 1 != 0, 0, q.astype(jnp.int32) ^ (folded & 0xF)
            )
            return swar.golay_encode_wide(
                swar.golay_pack_thirds(q & 0xF)
            ), scale
        return swar.golay_encode_wide(
            swar.golay_data12(q, head_dim)
        ), scale
    pv = swar.padded_values(codec, head_dim)
    if pv - head_dim:
        q = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, pv - head_dim)])
    q = q.astype(jnp.int32) & 0xF
    if inject:
        if folded is None:
            if mask is None:
                mask = flip_mask_for(key, q.shape, policy.ber, N_BITS[codec])
            folded = swar.scrub_fold_mask(codec, mask)
        q = q ^ (folded.astype(jnp.int32) & 0xF)
    if codec == "int4":
        return q, scale
    if codec == "hamming74":
        return hamming74_encode_i32(q), scale
    return hamming84_encode_i32(q), scale


def encode_kv_pair_scrubbed(k, v, policy: KVCachePolicy, k_key, v_key,
                            k_mask=None, v_mask=None, k_folded=None,
                            v_folded=None):
    """encode_kv_scrubbed for a (K, V) pair - kept as the runtimes' write
    entry point. With the scrub folded into the mask there is nothing left
    to batch across the pair: each tensor is one fused jnp chain.

    Returns ((k_codewords, k_scales), (v_codewords, v_scales))."""
    return (
        encode_kv_scrubbed(k, policy, k_key, mask=k_mask, folded=k_folded),
        encode_kv_scrubbed(v, policy, v_key, mask=v_mask, folded=v_folded),
    )


def encode_pack_kv_scrubbed(x, policy: KVCachePolicy, key, mask=None,
                            folded=None):
    """encode_kv_scrubbed + pack_kv in ONE chain - the decode step's write
    path. For golay the packed rows are built DIRECTLY from the folded
    nibbles (swar.golay_pack_rows_from_nibbles): the 36-op XOR-chain
    parity replaces golay_encode_wide's [12, ...] candidate-axis
    broadcast+reduce and the pack->unpack roundtrip of golay_split_pack
    disappears - the per-(layer, K/V) chain gets golay within reach of
    hamming84's (round-5 measured). Bit-identical stored rows to
    pack_kv(encode_kv_scrubbed(...)) (tests/test_codecs.py).

    Returns (packed_rows, scales)."""
    codec = policy.codec
    head_dim = x.shape[-1]
    if codec == "golay":
        inject = (
            policy.inject_errors and policy.ber > 0
            and policy.inject_at == "write"
        )
        q, scale = _quantize(jnp.asarray(x, jnp.float32))
        pv = swar.padded_values("golay", head_dim)
        if pv - head_dim:
            q = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(0, pv - head_dim)])
        q = q.astype(jnp.int32)
        if inject:
            if folded is None:
                if mask is None:
                    mask = flip_mask_for(
                        key, q.shape[:-1] + (pv // 3,), policy.ber,
                        N_BITS[codec],
                    )
                folded = swar.scrub_fold_mask(codec, mask)
            folded = folded.astype(jnp.int32)
            q = jnp.where((folded >> 4) & 1 != 0, 0, q ^ (folded & 0xF))
        return swar.golay_pack_rows_from_nibbles(q, head_dim), scale
    cw, scale = encode_kv_scrubbed(x, policy, key, mask=mask, folded=folded)
    return pack_kv(cw, policy, head_dim), scale


def hoisted_write_deltas(policy: KVCachePolicy, layer_keys, enc_shape):
    """EVERY layer's (K, V) write-path delta in ONE vmapped chain: draw the
    per-layer injection masks (bit-identically to the per-layer
    flip_mask_for calls - vmapped threefry equals the scalar calls) and
    fold the scrub into each (swar.scrub_fold_mask). The decode loop
    additionally vmaps this over steps, so all of golay's IMLD work runs
    in one bulk dispatch-amortized chain; each layer's write consumes a
    FREE slice (encode_kv_scrubbed(folded=...)).

    layer_keys: [L, 2] stacked typed keys ((k_key, v_key) per layer, the
    models/runtime.py:_layer_kv_key chain). enc_shape: the logical mask
    shape the threefry draw enumerates - the d12 codeword shape [..., C]
    for golay (the RNG stream is pinned to this shape), padded nibble
    shape otherwise.
    Returns uint8 [L, 2] + fold shape, where the fold shape is enc_shape
    except golay's last axis expands C -> 3C (per-value nibble deltas,
    swar.scrub_fold_mask)."""
    L = layer_keys.shape[0]
    flat = layer_keys.reshape(2 * L)
    n_bits = N_BITS[policy.codec]

    def one(kk):
        m = flip_mask_for(kk, enc_shape, policy.ber, n_bits)
        return swar.scrub_fold_mask(policy.codec, m)

    d = jax.vmap(one)(flat)
    d = d.reshape((L, 2) + d.shape[1:])
    return d.astype(jnp.uint8)


def pack_kv(enc, policy: KVCachePolicy, head_dim: int):
    """Logical codewords (encode_kv output) -> packed int32 storage words
    for the paged cache (kernels/swar.py layouts). fp16/fp8 pass through."""
    if policy.codec in ("fp16", "fp8"):
        return enc
    return swar.pack_codewords(policy.codec, enc, head_dim)


def decode_kv(enc, scale, policy: KVCachePolicy, *, head_dim: int,
              seq_axis: int = 1, read_key=None):
    """Decode + (interpolate) + dequantize. Inverse of encode_kv.

    With policy.inject_at == "read" (unprotected int4 arm), `read_key`
    drives FRESH Bernoulli flips on the raw nibbles before dequantization -
    the reference's attend-time corruption (unprotected_shim.py:276-302).

    Returns (x float32 [..., head_dim], corrected, detected[, read_flips
    when read_key is given]).
    """
    codec = policy.codec
    zero = jnp.zeros((), jnp.int32)
    read_inject = (
        policy.inject_at == "read"
        and policy.inject_errors
        and policy.ber > 0
        and read_key is not None
    )
    read_flips = zero
    if codec == "fp16" or codec == "fp8":
        out = enc.astype(jnp.float32), zero, zero
        return out + (read_flips,) if read_key is not None else out

    if codec == "int4":
        if read_inject:
            mask = flip_mask_for(read_key, enc.shape, policy.ber, 4)
            read_flips = jnp.sum(jax.lax.population_count(mask), dtype=jnp.int32)
            enc = enc ^ mask
        dec = enc & 0xF
        corrected = detected = zero
    elif codec == "hamming74":
        # arithmetic decoders throughout the runtime: the jnp reference
        # decoders gather from LUT arrays, which lowers to a slow XLA
        # gather per element on TPU (they remain the test oracles)
        dec, err = hamming74_decode_i32(enc.astype(jnp.int32))
        corrected = jnp.sum(err.astype(jnp.int32), dtype=jnp.int32)
        detected = zero
    elif codec == "hamming84":
        dec, et = hamming84_decode_i32(enc.astype(jnp.int32))
        corrected = jnp.sum((et == 1).astype(jnp.int32), dtype=jnp.int32)
        detected = jnp.sum((et == 2).astype(jnp.int32), dtype=jnp.int32)
        if policy.use_interpolation:
            dec = interpolate_double_errors(
                dec.astype(jnp.uint8), et, seq_dim=seq_axis
            ).astype(jnp.int32)
    elif codec == "golay":
        # arithmetic IMLD decode: the syndrome-LUT oracle (codecs.golay_decode)
        # costs one 4096-entry XLA gather per codeword - orders of magnitude
        # slower on the TPU VPU than the popcount/select chain
        data12, cnt = swar.golay_decode_wide(
            enc.astype(jnp.int32), zero_uncorrectable=False
        )
        corrected = jnp.sum(jnp.where(cnt < 4, cnt, 0), dtype=jnp.int32)
        detected = jnp.sum((cnt == 4).astype(jnp.int32), dtype=jnp.int32)
        dec = swar.golay_unpack_thirds(data12)
    else:
        raise ValueError(f"Unknown codec: {codec}")

    dec = dec[..., :head_dim]  # drop packing-granularity padding
    x = (dec.astype(jnp.float32) - 8.0) * scale[..., None]
    if read_key is not None:
        return x, corrected, detected, read_flips
    return x, corrected, detected


def kv_roundtrip(x, policy: KVCachePolicy, key, *, seq_axis: int = 1):
    """Apply the full codec chain to a K or V tensor [..., S, ..., D].

    The roundtrip-equivalent of the reference's write-then-attend through the
    paged cache (see module docstring).

    Returns (x_processed float32, stats dict of int32 scalars).
    """
    stats = empty_stats()
    x = jnp.asarray(x, jnp.float32)
    stats["total_values"] = jnp.asarray(x.size, jnp.int32)
    head_dim = x.shape[-1]
    enc, scale, flips = encode_kv(x, policy, key)
    read_key = (
        jax.random.fold_in(key, 0x52454144)  # "READ" stream
        if policy.inject_at == "read"
        else None
    )
    if read_key is not None:
        out, corrected, detected, read_flips = decode_kv(
            enc, scale, policy, head_dim=head_dim, seq_axis=seq_axis,
            read_key=read_key,
        )
        flips = flips + read_flips
    else:
        out, corrected, detected = decode_kv(
            enc, scale, policy, head_dim=head_dim, seq_axis=seq_axis
        )
    stats["bits_flipped"] = flips
    stats["errors_corrected"] = corrected
    stats["errors_detected"] = detected
    return out, stats


def process_kv(k, v, policy: KVCachePolicy, layer_idx: int, *, seq_axis: int = 1):
    """Protect a (K, V) pair for one layer. Keys are derived from
    (seed, layer, k/v) - deterministic, statistically independent streams
    (the reference's seed-per-write contract, ecc_shim.py:24-28)."""
    base = jax.random.key(policy.seed)
    base = jax.random.fold_in(base, layer_idx)
    k_key = jax.random.fold_in(base, 0)
    v_key = jax.random.fold_in(base, 1)
    k_out, k_stats = kv_roundtrip(k, policy, k_key, seq_axis=seq_axis)
    v_out, v_stats = kv_roundtrip(v, policy, v_key, seq_axis=seq_axis)
    stats = {key: k_stats[key] + v_stats[key] for key in k_stats}
    return k_out, v_out, stats


def merge_stats(acc, new):
    if acc is None:
        return dict(new)
    return {k: acc[k] + new[k] for k in acc}
