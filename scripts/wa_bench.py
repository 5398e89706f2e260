"""Microbench the fused write+attend kernel at headline-bench shapes.

Chained 24x per jit (one step's worth of layers), min of reps — isolates
the kernel from the rest of the decode step.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from qkv_ecc_tpu.benchmarks.harness import build_decode_attention_case
from qkv_ecc_tpu.kernels import swar
from qkv_ecc_tpu.kernels.paged_attention import paged_attention_ecc_write_attend

BATCH, HQ, HKV, D, CTX, BS = 8, 16, 8, 128, 1024, 128
LAYERS = 24


def run(codec, scrub):
    q, cache, bt, ctx, cfg = build_decode_attention_case(
        BATCH, HQ, HKV, D, CTX, BS, codec
    )
    if scrub:
        # a scrubbed cache stores only valid codewords; scrub the random
        # words so the extract path's contract holds
        for nm in ("k_cache", "v_cache"):
            w = cache[nm]
            # [blocks, layers, heads, words, bs] -> logical codewords
            cw = swar.unpack_codewords(codec, np.asarray(w), D, axis=-2)
            cw = swar.scrub_codewords(codec, jnp.asarray(cw))
            cache[nm] = jnp.asarray(
                swar.pack_codewords(codec, cw, D, axis=-2), jnp.int32
            )
    rw = cache["k_cache"].shape[-2]
    rng = np.random.default_rng(7)
    k_new = jnp.asarray(
        rng.integers(-(2**31), 2**31, (BATCH, HKV, rw), np.int64).astype(np.int32))
    if scrub:
        cwn = swar.scrub_codewords(
            codec, swar.unpack_codewords(codec, k_new, D, axis=-1))
        k_new = jnp.asarray(swar.pack_codewords(codec, cwn, D, axis=-1))
    v_new = k_new
    s_new = jnp.full((BATCH, HKV), 0.1, jnp.float32)

    def step(q, kc, vc, ks, vs):
        for i in range(LAYERS):
            outs = paged_attention_ecc_write_attend(
                q, k_new, v_new, s_new, s_new, kc, vc, ks, vs,
                bt, ctx, 0, scrub=scrub, codec=codec, block_size=BS,
            )
            o, kc, vc, ks, vs = outs[:5]
            q = q + o * 1e-9  # serialize layers through q
        return q, kc, vc, ks, vs

    f = jax.jit(step, donate_argnums=(1, 2, 3, 4))
    # k_scales and v_scales must be DISTINCT buffers: both are donated
    kc, vc, ks, vs = (cache["k_cache"], cache["v_cache"],
                      cache["k_scales"], cache["v_scales"] + 0)
    t0 = time.time()
    q2, kc, vc, ks, vs = f(q, kc, vc, ks, vs)
    q2.block_until_ready()
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        q2, kc, vc, ks, vs = f(q2, kc, vc, ks, vs)
        np.asarray(q2[0, 0, 0])
        best = min(best, time.perf_counter() - t0 - 0.025)
    print(f"{codec:10s} scrub={scrub!s:5s} {best*1e3:7.3f} ms per 24-layer "
          f"step ({best/LAYERS*1e3:.4f} ms/layer, compile {compile_s:.0f}s)",
          flush=True)


if __name__ == "__main__":
    run("int4", False)
    run("hamming84", True)
    run("golay", True)
    run("golay", False)
