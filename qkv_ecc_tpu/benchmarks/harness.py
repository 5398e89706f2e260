"""Kernel microbenchmark harness.

Port of the reference's kv_cache/benchmark_harness.py on JAX timers
(block_until_ready fencing instead of CUDA events): per-codec encode/decode
Mvalues/s, fault-injection throughput, encode->inject->decode pipeline,
randomized block tables, SDPA baseline vs fused ECC attention with overhead
ratio, and JSON emitters.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs import (
    golay_decode,
    golay_encode,
    hamming74_decode,
    hamming74_encode,
    hamming84_decode,
    hamming84_encode,
    inject_bit_errors,
)
from ..kernels import codec_kernels as ck
from ..evaluation.constants import compute_bandwidth_efficiency
from ..evaluation.timing import time_fn, time_fn_chained


@dataclasses.dataclass
class KernelBenchResult:
    name: str
    n_values: int
    time_ms: float
    mvalues_per_sec: float
    bytes_per_value: float = 1.0

    @property
    def gb_per_sec(self) -> float:
        return self.mvalues_per_sec * self.bytes_per_value / 1000.0

    def bandwidth_efficiency(self, chip: Optional[str] = None) -> float:
        return compute_bandwidth_efficiency(
            self.mvalues_per_sec, self.bytes_per_value, chip
        )

    def to_dict(self):
        d = dataclasses.asdict(self)
        d["gb_per_sec"] = self.gb_per_sec
        return d


def _bench(name, fn, *args, n_values, bytes_per_value=1.0, iters=20) -> KernelBenchResult:
    # chained timing: block_until_ready under-measures on remote runtimes
    dt = time_fn_chained(fn, *args, iters=iters)
    return KernelBenchResult(
        name=name,
        n_values=n_values,
        time_ms=dt * 1e3,
        mvalues_per_sec=n_values / dt / 1e6,
        bytes_per_value=bytes_per_value,
    )


def benchmark_hamming84(n: int = 16 * 1024 * 1024, pallas: bool = True):
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 16, n, dtype=np.uint8))
    enc_fn = ck.hamming84_encode_tpu if pallas else hamming84_encode
    cw = enc_fn(vals)
    dec_fn = ck.hamming84_decode_tpu if pallas else hamming84_decode
    return [
        _bench("hamming84_encode", enc_fn, vals, n_values=n, bytes_per_value=2),
        _bench("hamming84_decode", dec_fn, cw, n_values=n, bytes_per_value=3),
    ]


def benchmark_hamming74(n: int = 16 * 1024 * 1024, pallas: bool = True):
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 16, n, dtype=np.uint8))
    enc_fn = ck.hamming74_encode_tpu if pallas else hamming74_encode
    cw = enc_fn(vals)
    dec_fn = ck.hamming74_decode_tpu if pallas else hamming74_decode
    return [
        _bench("hamming74_encode", enc_fn, vals, n_values=n, bytes_per_value=2),
        _bench("hamming74_decode", dec_fn, cw, n_values=n, bytes_per_value=3),
    ]


def benchmark_golay(n_triplets: int = 4 * 1024 * 1024, pallas: bool = True):
    rng = np.random.default_rng(0)
    trip = jnp.asarray(rng.integers(0, 16, (n_triplets, 3), dtype=np.uint8))
    enc_fn = ck.golay_encode_tpu if pallas else golay_encode
    cw = enc_fn(trip)
    dec_fn = ck.golay_decode_tpu if pallas else golay_decode
    n_values = n_triplets * 3
    return [
        _bench("golay_encode", enc_fn, trip, n_values=n_values, bytes_per_value=7 / 3),
        _bench("golay_decode", dec_fn, cw, n_values=n_values, bytes_per_value=7 / 3),
    ]


def benchmark_fault_injection(n: int = 16 * 1024 * 1024, ber: float = 1e-2):
    data = jnp.zeros(n, jnp.uint8)

    def tpu_inject(d):
        return ck.inject_bit_errors_tpu(d, ber, 8, 42)

    def threefry_inject(d):
        return inject_bit_errors(d, ber, 8, seed=42)

    return [
        _bench("fault_injection_pallas_prng", tpu_inject, data, n_values=n, bytes_per_value=2),
        _bench("fault_injection_threefry", threefry_inject, data, n_values=n, bytes_per_value=2),
    ]


def benchmark_encode_inject_decode(n: int = 8 * 1024 * 1024, ber: float = 1e-2):
    """Full pipeline roundtrip (reference benchmark_harness.py:174)."""
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 16, n, dtype=np.uint8))

    @jax.jit
    def pipeline(v):
        cw = hamming84_encode(v)
        cw = inject_bit_errors(cw, ber, 8, seed=1)
        data, _, c, d = hamming84_decode(cw)
        return data, c, d

    return [_bench("h84_encode_inject_decode", pipeline, vals, n_values=n, bytes_per_value=4)]


def create_random_block_table(batch: int, num_pages: int, num_blocks: int, seed=0):
    """Randomized non-contiguous block assignment
    (reference benchmark_harness.py:213)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(num_blocks)[: batch * num_pages]
    return jnp.asarray(perm.reshape(batch, num_pages).astype(np.int32))


def build_decode_attention_case(
    batch=8, num_q_heads=32, num_kv_heads=8, head_dim=128, context_len=1024,
    block_size=128, codec="hamming84", seed=0,
):
    """Random paged cache + query for the attention benchmark."""
    from ..cache.layout import ECCCacheConfig, allocate_ecc_kv_cache

    num_pages = -(-context_len // block_size)
    cfg = ECCCacheConfig(
        num_blocks=batch * num_pages,
        block_size=block_size,
        num_layers=1,
        num_kv_heads=num_kv_heads,
        head_dim=head_dim,
        codec=codec,
    )
    rng = np.random.default_rng(seed)
    cache = allocate_ecc_kv_cache(cfg)
    if codec in ("fp16", "fp8"):
        raw = rng.normal(size=cache["k_cache"].shape).astype(np.float32)
        cache["k_cache"] = jnp.asarray(raw, cfg.cache_dtype)
        cache["v_cache"] = jnp.asarray(raw, cfg.cache_dtype)
    else:
        # random packed int32 storage words = random codeword bits (split
        # layout: data and parity arrays randomized independently)
        for name in ("k_cache", "v_cache", "k_parity", "v_parity"):
            if name not in cache:
                continue
            raw = rng.integers(
                -(2**31), 2**31, cache[name].shape, dtype=np.int64
            ).astype(np.int32)
            cache[name] = jnp.asarray(raw)
    cache["k_scales"] = jnp.asarray(
        rng.uniform(0.05, 0.2, cache["k_scales"].shape).astype(np.float32)
    )
    cache["v_scales"] = cache["k_scales"]
    block_table = create_random_block_table(batch, num_pages, cfg.num_blocks, seed)
    q = jnp.asarray(rng.normal(size=(batch, num_q_heads, head_dim)).astype(np.float32))
    ctx = jnp.full((batch,), context_len, jnp.int32)
    return q, cache, block_table, ctx, cfg


def benchmark_ecc_attention(
    batch=8, num_q_heads=32, num_kv_heads=8, head_dim=128, context_len=1024,
    block_size=128, codec="hamming84",
) -> Dict:
    """Fused ECC attention vs an unpaged bf16 SDPA baseline
    (reference benchmark_harness.py:400-510)."""
    from ..kernels.paged_attention import paged_attention_ecc

    q, cache, block_table, ctx, cfg = build_decode_attention_case(
        batch, num_q_heads, num_kv_heads, head_dim, context_len, block_size, codec
    )

    def ecc_attn(q):
        return paged_attention_ecc(
            q, cache["k_cache"], cache["v_cache"], cache["k_scales"],
            cache["v_scales"], block_table, ctx, 0,
            cache.get("k_parity"), cache.get("v_parity"),
            codec=codec, block_size=block_size,
        )

    dt_ecc = time_fn_chained(jax.jit(ecc_attn), q)

    # SDPA baseline: dense bf16 decode attention at the same shapes
    rng = np.random.default_rng(1)
    k = jnp.asarray(
        rng.normal(size=(batch, context_len, num_kv_heads, head_dim)), jnp.bfloat16
    )
    v = k

    @jax.jit
    def sdpa(q):
        g = num_q_heads // num_kv_heads
        qg = q.reshape(batch, num_kv_heads, g, head_dim).astype(jnp.bfloat16)
        s = jnp.einsum("bhgd,bthd->bhgt", qg, k).astype(jnp.float32)
        w = jax.nn.softmax(s / np.sqrt(head_dim), axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhgt,bthd->bhgd", w, v).reshape(batch, num_q_heads, head_dim)

    dt_sdpa = time_fn_chained(sdpa, q)
    tokens_per_sec = batch / dt_ecc
    return {
        "codec": codec,
        "batch": batch,
        "context_len": context_len,
        "ecc_attention_ms": dt_ecc * 1e3,
        "sdpa_baseline_ms": dt_sdpa * 1e3,
        "overhead_ratio": dt_ecc / dt_sdpa,
        "decode_tokens_per_sec": tokens_per_sec,
    }


def run_attention_benchmark_suite(
    batches=(1, 8), context_lens=(512, 2048), codec="hamming84"
) -> List[Dict]:
    out = []
    for b in batches:
        for ctx in context_lens:
            out.append(
                benchmark_ecc_attention(batch=b, context_len=ctx, codec=codec)
            )
    return out


def benchmark_cpu_vs_tpu_hamming84(n: int = 4 * 1024 * 1024) -> Dict:
    """Hamming(8,4) decode on the host CPU (jnp reference decoders) vs the
    accelerator (Pallas kernels) - the reference's CPU-vs-GPU comparison
    (benchmark_harness.py:592)."""
    rng = np.random.default_rng(0)
    cw_host = rng.integers(0, 256, n, dtype=np.uint8)

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    out: Dict = {"n_values": n}

    accel = jax.devices()[0]
    cw_acc = jax.device_put(jnp.asarray(cw_host), accel)
    dt_acc = time_fn_chained(ck.hamming84_decode_tpu, cw_acc, iters=10)
    out["accel_platform"] = accel.platform
    out["accel_ms"] = dt_acc * 1e3
    out["accel_mvalues_per_sec"] = n / dt_acc / 1e6

    if cpu is not None and cpu.platform != accel.platform:
        cw_cpu = jax.device_put(jnp.asarray(cw_host), cpu)

        @jax.jit
        def cpu_decode(x):
            data, et, c, d = hamming84_decode(x)
            return data

        with jax.default_device(cpu):
            dt_cpu = time_fn(cpu_decode, cw_cpu, iters=5)
        out["cpu_ms"] = dt_cpu * 1e3
        out["cpu_mvalues_per_sec"] = n / dt_cpu / 1e6
        out["speedup"] = dt_cpu / dt_acc
    return out


def run_full_benchmark(n: int = 8 * 1024 * 1024, attention: bool = True) -> Dict:
    """Full suite (reference benchmark_harness.py:654)."""
    results: Dict[str, object] = {"kernels": [], "attention": []}
    for bench in (
        benchmark_hamming84(n),
        benchmark_hamming74(n),
        benchmark_golay(n // 3),
        benchmark_fault_injection(n),
        benchmark_encode_inject_decode(n),
    ):
        results["kernels"].extend(r.to_dict() for r in bench)
    results["cpu_vs_accelerator"] = benchmark_cpu_vs_tpu_hamming84(n // 2)
    if attention:
        results["attention"] = run_attention_benchmark_suite()
    return results


def save_benchmark_json(results: Dict, path: str):
    with open(path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    res = run_full_benchmark()
    print(json.dumps(res, indent=2))
