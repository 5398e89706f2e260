"""The ECC cache engine: quantize -> encode -> (inject) -> store on write;
load -> decode -> (interpolate) -> dequantize -> attention on attend.

TPU-native equivalent of the reference's ECCBackend (kv_cache/ecc_shim.py:363)
with the same codec semantics and error accounting, but a fundamentally
different execution model:

  * write() is ONE jitted vectorized call per (layer, step) covering all
    tokens and heads - the reference looped in Python over
    (batch, position, head) launching a CUDA kernel per element row
    (ecc_shim.py:626-737), its biggest performance sin.
  * attend() dispatches to the fused Pallas paged-attention kernel for
    decode-phase queries (ALL protected codecs incl. golay - the reference
    fused only hamming84) and to a vectorized jnp path for prefill /
    interpolation / float codecs.
  * State is functional: the cache arrays are donated through the jitted
    update and error statistics come back as arrays, accumulated into Python
    ints by this thin stateful wrapper.

Decode-path semantics intentionally preserved from the reference:
  * Standalone/prefill golay decode PRESERVES uncorrectable data
    (golay_triton.py:267-271); the fused decode-phase kernel ZEROES it
    (attention_ecc.py:257-259).
  * hamming84 preserves double-error data in both paths; with
    use_interpolation the doubles are replaced by temporal neighbor
    averages along the context axis (ecc_shim.py:1049-1059).
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from ..codecs.algebra import GOLAY_B_ROW_MASKS
from ..codecs.fault_injection import flip_mask_for
from ..codecs.interpolation import interpolate_double_errors
from ..kernels.common import (
    hamming74_decode_i32,
    hamming84_decode_i32,
)
from ..kernels import swar
from ..kernels.paged_attention import paged_attention_ecc
from .block_manager import BlockManager
from .layout import ECCCacheConfig, allocate_ecc_kv_cache

_B_MASKS = tuple(int(m) for m in GOLAY_B_ROW_MASKS)

CODEC_N_BITS = {"int4": 4, "hamming74": 7, "hamming84": 8, "golay": 24, "fp8": 8}


@dataclasses.dataclass
class ECCEngineConfig:
    """Mirror of the reference's ECCShimConfig (ecc_shim.py:134)."""

    codec: str = "hamming84"
    ber: float = 0.0
    # 128 tokens/block: the fused attention kernel requires
    # block_size % 128 == 0 on real TPUs (token-minor lane alignment)
    block_size: int = 128
    num_blocks: int = 256
    inject_errors: bool = False
    seed: int = 42
    use_interpolation: bool = False
    max_seqs: int = 32
    # "write" = flips persist in the stored codewords (protected arms);
    # "read" = fresh flips on the raw int4 nibbles at every attend (the
    # reference's unprotected-arm fault model, unprotected_shim.py:276-302)
    inject_at: str = "write"

    SUPPORTED_CODECS = ("fp16", "fp8", "int4", "hamming74", "hamming84", "golay")

    def __post_init__(self):
        if self.codec not in self.SUPPORTED_CODECS:
            raise ValueError(
                f"Unsupported codec: '{self.codec}'. "
                f"Supported codecs: {sorted(self.SUPPORTED_CODECS)}"
            )
        if self.inject_at not in ("write", "read"):
            raise ValueError(f"inject_at must be write|read: {self.inject_at}")
        if self.inject_at == "read" and self.codec != "int4":
            raise ValueError(
                "read-time injection is only defined for the unprotected "
                "int4 arm (reference unprotected_shim.py:276)"
            )


# =============================================================================
# jitted write step
# =============================================================================


@functools.partial(
    jax.jit,
    static_argnames=("codec", "inject", "head_dim"),
    donate_argnums=(0,),
)
def _write_step(
    cache,
    k,
    v,
    layer_idx,
    phys_blocks,
    slots,
    key,
    ber,
    *,
    codec: str,
    inject: bool,
    head_dim: int,
):
    """Quantize+encode+inject+scatter S tokens into the paged cache (the
    donated `cache` dict; rows split at the data/parity boundary - round-5
    split layout, cache/layout.py).

    k, v: [S, H, D] float. phys_blocks/slots: [S] int32.
    Returns (updated cache dict, k_flips, v_flips).
    """

    def quantize(x):
        absmax = jnp.max(jnp.abs(x), axis=-1)
        scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
        q = jnp.clip(jnp.round(x / scale[..., None]), -8, 7) + 8
        return q.astype(jnp.int32), scale.astype(jnp.float32)

    kq, ks = quantize(k.astype(jnp.float32))
    vq, vs = quantize(v.astype(jnp.float32))
    # logical per-value codewords (the fault-injection domain)
    kc = swar.encode_codewords(codec, kq, head_dim)
    vc = swar.encode_codewords(codec, vq, head_dim)

    k_flips = jnp.zeros((), jnp.int32)
    v_flips = jnp.zeros((), jnp.int32)
    if inject:
        n_bits = CODEC_N_BITS[codec]
        kk, vk = jax.random.split(key)
        km = flip_mask_for(kk, kc.shape, ber, n_bits)
        vm = flip_mask_for(vk, vc.shape, ber, n_bits)
        k_flips = jnp.sum(jax.lax.population_count(km), dtype=jnp.int32)
        v_flips = jnp.sum(jax.lax.population_count(vm), dtype=jnp.int32)
        kc = kc ^ km
        vc = vc ^ vm

    # pack logical codewords into int32 storage words (pure bit relabeling;
    # injection above already happened on the codeword bits)
    kc = swar.pack_codewords(codec, kc, head_dim)
    vc = swar.pack_codewords(codec, vc, head_dim)

    # scatter (token-minor layout): cache[layer, phys[s], h, :, slot[s]] =
    # cw[s, h, :], data prefix and parity suffix into their own arrays
    dw = cache["k_cache"].shape[3]
    cache["k_cache"] = cache["k_cache"].at[
        layer_idx, phys_blocks, :, :, slots].set(kc[..., :dw])
    cache["v_cache"] = cache["v_cache"].at[
        layer_idx, phys_blocks, :, :, slots].set(vc[..., :dw])
    if "k_parity" in cache:
        cache["k_parity"] = cache["k_parity"].at[
            layer_idx, phys_blocks, :, :, slots].set(kc[..., dw:])
        cache["v_parity"] = cache["v_parity"].at[
            layer_idx, phys_blocks, :, :, slots].set(vc[..., dw:])
    cache["k_scales"] = cache["k_scales"].at[
        layer_idx, phys_blocks, :, slots].set(ks)
    cache["v_scales"] = cache["v_scales"].at[
        layer_idx, phys_blocks, :, slots].set(vs)
    return cache, k_flips, v_flips


@functools.partial(
    jax.jit, static_argnames=("codec", "inject"), donate_argnums=(0,)
)
def _write_step_float(
    cache, k, v, layer_idx, phys_blocks, slots, key, ber, *,
    codec: str, inject: bool
):
    """fp16/fp8 write: store raw values (fp8 optionally corrupted bytewise,
    reference ecc_shim.py:535-570; fp16 is the uncorrupted oracle :511)."""
    kc = k.astype(cache["k_cache"].dtype)
    vc = v.astype(cache["v_cache"].dtype)
    k_flips = jnp.zeros((), jnp.int32)
    v_flips = jnp.zeros((), jnp.int32)
    if inject and codec == "fp8":
        kk, vk = jax.random.split(key)
        k_bytes = jax.lax.bitcast_convert_type(kc, jnp.uint8)
        v_bytes = jax.lax.bitcast_convert_type(vc, jnp.uint8)
        km = flip_mask_for(kk, k_bytes.shape, ber, 8).astype(jnp.uint8)
        vm = flip_mask_for(vk, v_bytes.shape, ber, 8).astype(jnp.uint8)
        k_flips = jnp.sum(jax.lax.population_count(km.astype(jnp.int32)), dtype=jnp.int32)
        v_flips = jnp.sum(jax.lax.population_count(vm.astype(jnp.int32)), dtype=jnp.int32)
        kc = jax.lax.bitcast_convert_type(k_bytes ^ km, cache["k_cache"].dtype)
        vc = jax.lax.bitcast_convert_type(v_bytes ^ vm, cache["v_cache"].dtype)
    cache["k_cache"] = cache["k_cache"].at[
        layer_idx, phys_blocks, :, :, slots].set(kc)
    cache["v_cache"] = cache["v_cache"].at[
        layer_idx, phys_blocks, :, :, slots].set(vc)
    return cache, k_flips, v_flips


# =============================================================================
# jitted attend (general jnp path)
# =============================================================================


@functools.partial(
    jax.jit,
    static_argnames=("codec", "use_interpolation", "head_dim", "num_ctx",
                     "causal", "read_ber"),
)
def _attend_general(
    q,  # [Hq, S, D]
    k_cache,
    v_cache,
    k_scales,
    v_scales,
    block_table_row,  # [max_blocks]
    layer_idx,
    read_key=None,  # drives fresh read-time nibble flips (int4 arm)
    k_parity=None,  # split-layout parity arrays (None: int4/fp16/fp8)
    v_parity=None,
    *,
    codec: str,
    use_interpolation: bool,
    head_dim: int,
    num_ctx: int,  # static context length (tokens)
    causal: bool,
    read_ber: float = 0.0,
):
    """Gather + decode + (interpolate) + dequant + SDPA over one sequence.

    num_ctx is static (prefill processes a known-length text; the decode path
    uses the fused kernel instead), which lets the gather be exact-size.
    """
    bs = k_cache.shape[4]
    n_pages = -(-num_ctx // bs)
    table = jnp.maximum(block_table_row[:n_pages], 0)

    def gather(cache):
        g = cache[layer_idx][table]  # [pages, H, cw, bs] (token-minor)
        g = jnp.transpose(g, (0, 3, 1, 2)).reshape(n_pages * bs, g.shape[1], -1)
        return g[:num_ctx]  # [T, H, cw]

    k_raw = gather(k_cache)
    v_raw = gather(v_cache)
    if k_parity is not None:
        # rebuild full logical rows: data prefix ++ parity suffix
        k_raw = jnp.concatenate([k_raw, gather(k_parity)], axis=-1)
        v_raw = jnp.concatenate([v_raw, gather(v_parity)], axis=-1)
    if codec not in ("fp16", "fp8"):
        # packed int32 storage words -> logical per-value codewords
        k_raw = swar.unpack_codewords(codec, k_raw, head_dim)
        v_raw = swar.unpack_codewords(codec, v_raw, head_dim)

    stats = {
        "corrected": jnp.zeros((), jnp.int32),
        "detected": jnp.zeros((), jnp.int32),
        "read_flips": jnp.zeros((), jnp.int32),
    }
    if read_ber > 0 and read_key is not None:
        assert codec == "int4"
        kk, vk = jax.random.split(read_key)
        km = flip_mask_for(kk, k_raw.shape, read_ber, 4)
        vm = flip_mask_for(vk, v_raw.shape, read_ber, 4)
        stats["read_flips"] = jnp.sum(
            jax.lax.population_count(km), dtype=jnp.int32
        ) + jnp.sum(jax.lax.population_count(vm), dtype=jnp.int32)
        k_raw = k_raw ^ km
        v_raw = v_raw ^ vm

    def decode(raw):
        if codec == "fp16" or codec == "fp8":
            return raw.astype(jnp.float32), None
        if codec == "int4":
            return raw.astype(jnp.int32) & 0xF, None
        if codec == "hamming74":
            data, err = hamming74_decode_i32(raw.astype(jnp.int32))
            stats["corrected"] = stats["corrected"] + jnp.sum(
                err.astype(jnp.int32), dtype=jnp.int32
            )
            return data, None
        if codec == "hamming84":
            data, et = hamming84_decode_i32(raw.astype(jnp.int32))
            stats["corrected"] = stats["corrected"] + jnp.sum(
                (et == 1).astype(jnp.int32), dtype=jnp.int32
            )
            stats["detected"] = stats["detected"] + jnp.sum(
                (et == 2).astype(jnp.int32), dtype=jnp.int32
            )
            return data, et
        raise ValueError(codec)

    if codec in ("fp16", "fp8"):
        k_f = k_raw.astype(jnp.float32)
        v_f = v_raw.astype(jnp.float32)
    elif codec == "golay":

        def golay_path(raw):
            # arithmetic IMLD decode, preserving uncorrectable data (the
            # reference's python-path semantics, golay_triton.py:267-271).
            # The syndrome-LUT oracle costs one 4096-entry gather per
            # codeword - far slower on the TPU VPU.
            data12, cnt = swar.golay_decode_wide(
                raw.astype(jnp.int32), zero_uncorrectable=False
            )
            stats["corrected"] = stats["corrected"] + jnp.sum(
                jnp.where(cnt < 4, cnt, 0), dtype=jnp.int32
            )
            stats["detected"] = stats["detected"] + jnp.sum(
                (cnt == 4).astype(jnp.int32), dtype=jnp.int32
            )
            return swar.golay_unpack_thirds(data12)[..., :head_dim]

        k_nib = golay_path(k_raw)
        v_nib = golay_path(v_raw)
    else:
        k_nib, k_et = decode(k_raw)
        v_nib, v_et = decode(v_raw)
        k_nib = k_nib[..., :head_dim]
        v_nib = v_nib[..., :head_dim]
        if k_et is not None:
            k_et = k_et[..., :head_dim]
            v_et = v_et[..., :head_dim]
        if codec == "hamming84" and use_interpolation:
            k_nib = interpolate_double_errors(
                k_nib.astype(jnp.uint8), k_et, seq_dim=0
            ).astype(jnp.int32)
            v_nib = interpolate_double_errors(
                v_nib.astype(jnp.uint8), v_et, seq_dim=0
            ).astype(jnp.int32)

    def gather_scales(scales):
        g = scales[layer_idx][table]  # [pages, H, bs]
        g = jnp.transpose(g, (0, 2, 1)).reshape(n_pages * bs, -1)
        return g[:num_ctx]  # [T, H]

    if codec not in ("fp16", "fp8"):
        ks = gather_scales(k_scales)
        vs = gather_scales(v_scales)
        k_f = (k_nib.astype(jnp.float32) - 8.0) * ks[..., None]
        v_f = (v_nib.astype(jnp.float32) - 8.0) * vs[..., None]

    # k_f/v_f: [T, H, D] -> attention
    Hq, S, D = q.shape
    Hkv = k_f.shape[1]
    group = Hq // Hkv
    qg = q.reshape(Hkv, group, S, D).astype(jnp.float32)
    s = jnp.einsum(
        "hgsd,thd->hgst", qg, k_f, precision=jax.lax.Precision.HIGHEST
    ) / jnp.sqrt(jnp.float32(D))
    if causal:
        # align last S queries with the last S context tokens
        offset = num_ctx - S
        qi = jnp.arange(S)[:, None]
        tj = jnp.arange(num_ctx)[None, :]
        mask = tj <= qi + offset
        s = jnp.where(mask[None, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "hgst,thd->hgsd", w, v_f, precision=jax.lax.Precision.HIGHEST
    )
    out = out.reshape(Hq, S, D)
    return out, stats["corrected"], stats["detected"], stats["read_flips"]


# =============================================================================
# Engine
# =============================================================================


class ECCEngine:
    """Stateful wrapper: owns cache arrays, the block manager, RNG stream,
    and error statistics (reference ECCBackend, ecc_shim.py:363)."""

    def __init__(
        self,
        config: ECCEngineConfig,
        num_layers: int,
        num_heads: int,
        num_kv_heads: int,
        head_dim: int,
    ):
        self.config = config
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.num_kv_groups = num_heads // num_kv_heads

        self.cache_config = ECCCacheConfig(
            num_blocks=config.num_blocks,
            block_size=config.block_size,
            num_layers=num_layers,
            num_kv_heads=num_kv_heads,
            head_dim=head_dim,
            codec=config.codec,
            max_seqs=config.max_seqs,
        )
        self.cache = allocate_ecc_kv_cache(self.cache_config)
        self.manager = BlockManager(
            config.num_blocks, config.block_size, config.max_seqs
        )
        self.reset_stats()

    # --- statistics -------------------------------------------------------

    def reset_stats(self):
        self._injection_count = 0
        self._errors_corrected = 0
        self._errors_detected = 0
        self._total_values = 0
        self._bits_flipped = 0
        self._total_bits = 0
        self._read_count = 0

    def reset(self):
        self.manager.reset()
        for k in self.cache:
            self.cache[k] = jnp.zeros_like(self.cache[k])
        self.reset_stats()

    @property
    def stats(self):
        return {
            "injection_count": self._injection_count,
            "errors_corrected": self._errors_corrected,
            "errors_detected": self._errors_detected,
            "total_values": self._total_values,
            "bits_flipped": self._bits_flipped,
            "total_bits": self._total_bits,
            "actual_ber": (
                self._bits_flipped / self._total_bits if self._total_bits else 0.0
            ),
        }

    # --- write ------------------------------------------------------------

    def _injection_key(self, layer_idx: int):
        key = jax.random.key(self.config.seed)
        key = jax.random.fold_in(key, layer_idx)
        key = jax.random.fold_in(key, self._injection_count)
        return key

    def write(self, k, v, layer_idx: int, seq_id: int = 0, start_pos: int = 0):
        """Write S tokens at positions [start_pos, start_pos+S).

        k, v: [S, H*D] or [S, H, D] float arrays.
        """
        k = jnp.asarray(k)
        v = jnp.asarray(v)
        if k.ndim == 2:
            k = k.reshape(k.shape[0], self.num_kv_heads, self.head_dim)
            v = v.reshape(v.shape[0], self.num_kv_heads, self.head_dim)
        S = k.shape[0]
        self._total_values += 2 * S * self.num_kv_heads * self.head_dim

        end = start_pos + S
        if self.manager.get_context_len(seq_id) < end:
            self.manager.allocate(seq_id, end)
        phys, slots = self.manager.physical_slots(
            seq_id, np.arange(start_pos, end)
        )
        phys = jnp.asarray(phys)
        slots = jnp.asarray(slots)

        inject = bool(
            self.config.inject_errors
            and self.config.ber > 0
            and self.config.codec != "fp16"
            and self.config.inject_at == "write"
        )
        key = self._injection_key(layer_idx)
        if inject:
            self._injection_count += 1

        if self.config.codec in ("fp16", "fp8"):
            self.cache, kf, vf = _write_step_float(
                self.cache, k, v, layer_idx, phys, slots,
                key, jnp.float32(self.config.ber),
                codec=self.config.codec, inject=inject,
            )
        else:
            self.cache, kf, vf = _write_step(
                self.cache, k, v, layer_idx, phys, slots, key,
                jnp.float32(self.config.ber),
                codec=self.config.codec, inject=inject,
                head_dim=self.head_dim,
            )
        if inject:
            flips = int(kf) + int(vf)
            self._bits_flipped += flips
            n_bits = CODEC_N_BITS[self.config.codec]
            pv = swar.padded_values(self.config.codec, self.head_dim)
            rows = pv // 3 if self.config.codec == "golay" else pv
            self._total_bits += 2 * S * self.num_kv_heads * rows * n_bits

    # --- attend -----------------------------------------------------------

    def attend(self, q, layer_idx: int, seq_id: int = 0):
        """Attention of q [Hq, S, D] (or [1, Hq, S, D]) over the cached
        context of seq_id. Returns same-shaped output."""
        q = jnp.asarray(q)
        squeeze = False
        if q.ndim == 4:
            assert q.shape[0] == 1, "engine attend is per-sequence"
            q = q[0]
            squeeze = True
        Hq, S, D = q.shape

        ctx = self.manager.get_context_len(seq_id)
        if ctx == 0:
            out = jnp.zeros_like(q)
            return out[None] if squeeze else out

        read = bool(
            self.config.inject_at == "read"
            and self.config.inject_errors
            and self.config.ber > 0
        )
        if read:
            self._read_count = getattr(self, "_read_count", 0) + 1
            read_key = jax.random.fold_in(
                jax.random.key(self.config.seed ^ 0x52454144), self._read_count
            )
            read_key = jax.random.fold_in(read_key, layer_idx)

        use_fused = (
            S == 1
            and self.config.codec in ("int4", "hamming74", "hamming84", "golay")
            and not self.config.use_interpolation
        )
        table = self.manager.block_table()
        if use_fused:
            n_pages = -(-ctx // self.config.block_size)
            kwargs = {}
            if read:
                kwargs = dict(
                    read_inject_ber=float(self.config.ber),
                    read_inject_seed=jax.random.bits(
                        read_key, (), "uint32"
                    ).astype(jnp.int32),
                    collect_stats=True,
                )
            out = paged_attention_ecc(
                q[:, 0, :][None],  # [1, Hq, D]
                self.cache["k_cache"],
                self.cache["v_cache"],
                self.cache["k_scales"],
                self.cache["v_scales"],
                table[seq_id : seq_id + 1, :],
                jnp.asarray([ctx], jnp.int32),
                layer_idx,
                self.cache.get("k_parity"),
                self.cache.get("v_parity"),
                codec=self.config.codec,
                block_size=self.config.block_size,
                num_pages=n_pages,
                **kwargs,
            )
            if read:
                out, kstats = out
                self._bits_flipped += int(kstats[0, 0])
                self._total_bits += 2 * ctx * self.num_kv_heads * (
                    swar.padded_values("int4", self.head_dim) * 4
                )
            out = out[0][:, None, :]  # [Hq, 1, D]
        else:
            out, corrected, detected, read_flips = _attend_general(
                q,
                self.cache["k_cache"],
                self.cache["v_cache"],
                self.cache.get("k_scales"),
                self.cache.get("v_scales"),
                table[seq_id],
                layer_idx,
                read_key if read else None,
                self.cache.get("k_parity"),
                self.cache.get("v_parity"),
                codec=self.config.codec,
                use_interpolation=self.config.use_interpolation,
                head_dim=self.head_dim,
                num_ctx=ctx,
                causal=S > 1,
                read_ber=float(self.config.ber) if read else 0.0,
            )
            self._errors_corrected += int(corrected)
            self._errors_detected += int(detected)
            if read:
                self._bits_flipped += int(read_flips)
                self._total_bits += 2 * ctx * self.num_kv_heads * (
                    swar.padded_values("int4", self.head_dim) * 4
                )
        return out[None] if squeeze else out
