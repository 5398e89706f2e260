"""Microbench the fused write+attend kernel at headline-bench shapes.

Chained 24x per jit (one step's worth of layers), with the VARIANTS'
timed rounds interleaved round-robin (the tunnel drifts minute-to-minute;
back-to-back ratios are the only reliable signal - CLAUDE.md). Variants:

  int4             the unprotected baseline kernel
  <codec>          split-layout scrub extract path (production): the kernel
                   reads/writes ONLY the data arrays - identical page DMAs
                   to int4 (the deferred parity scatter is jnp-level and
                   not part of this kernel microbench)
  <codec>-decode   always-decode path: data + parity both stream (two
                   contiguous streams) and the correcting decode runs
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
ROUNDS = 24


class Variant:
    def __init__(self, codec, scrub):
        self.name = codec + ("" if scrub or codec == "int4" else "-decode")
        self.codec, self.scrub = codec, scrub
        self.best = float("inf")

    def build(self):
        codec, scrub = self.codec, self.scrub
        q, cache, bt, ctx, cfg = build_decode_attention_case(
            BATCH, HQ, HKV, D, CTX, BS, codec
        )
        has_parity = "k_parity" in cache
        if scrub and codec != "int4":
            # a scrubbed cache stores only valid codewords; scrub the random
            # words so the extract path's contract holds
            for nm in ("k", "v"):
                full = swar.join_rows(
                    codec, cache[f"{nm}_cache"], cache.get(f"{nm}_parity"),
                    axis=-2,
                )
                cw = swar.unpack_codewords(codec, np.asarray(full), D, axis=-2)
                cw = swar.scrub_codewords(codec, jnp.asarray(cw))
                packed = swar.pack_codewords(codec, cw, D, axis=-2)
                d, p = swar.split_rows(codec, packed, D, axis=-2)
                cache[f"{nm}_cache"] = jnp.asarray(d, jnp.int32)
                if p is not None:
                    cache[f"{nm}_parity"] = jnp.asarray(p, jnp.int32)
        rw = swar.row_words(codec, D)
        rng = np.random.default_rng(7)
        k_new = jnp.asarray(
            rng.integers(-(2**31), 2**31, (BATCH, HKV, rw), np.int64)
            .astype(np.int32))
        if codec != "int4":
            cwn = swar.scrub_codewords(
                codec, swar.unpack_codewords(codec, k_new, D, axis=-1))
            k_new = jnp.asarray(swar.pack_codewords(codec, cwn, D, axis=-1))
        extract = scrub and swar.scrub_extract_ok(codec, D)
        if extract:
            k_new = k_new[..., : swar.data_words(codec, D)]
        v_new = k_new
        s_new = jnp.full((BATCH, HKV), 0.1, jnp.float32)
        stream_parity = has_parity and not extract

        def step(q, kc, vc, ks, vs, *par):
            for i in range(LAYERS):
                outs = paged_attention_ecc_write_attend(
                    q, k_new, v_new, s_new, s_new, kc, vc, ks, vs,
                    bt, ctx, 0, *par, scrub=scrub, codec=codec,
                    block_size=BS,
                )
                if par:
                    o, kc, vc, kp, vp, ks, vs = outs
                    par = (kp, vp)
                else:
                    o, kc, vc, ks, vs = outs
                q = q + o * 1e-9  # serialize layers through q
            return (q, kc, vc, ks, vs) + par

        self.f = jax.jit(step, donate_argnums=tuple(
            range(1, 5 + (2 if stream_parity else 0))))
        # k_scales and v_scales must be DISTINCT buffers: both are donated
        self.bufs = [cache["k_cache"], cache["v_cache"],
                     cache["k_scales"], cache["v_scales"] + 0]
        if stream_parity:
            self.bufs += [cache["k_parity"], cache["v_parity"]]
        t0 = time.time()
        self._run()
        print(f"  {self.name}: compile {time.time()-t0:.0f}s", flush=True)

    def _run(self):
        q2, *self.bufs = self.f(self.q if hasattr(self, "q") else
                                jnp.zeros((BATCH, HQ, D), jnp.float32),
                                *self.bufs)
        self.q = q2
        np.asarray(q2[0, 0, 0])

    def timed(self):
        t0 = time.perf_counter()
        self._run()
        self.best = min(self.best, time.perf_counter() - t0 - 0.025)


if __name__ == "__main__":
    variants = [
        Variant("int4", False),
        Variant("hamming84", True),
        Variant("hamming84", False),
        Variant("golay", True),
        Variant("golay", False),
    ]
    for v in variants:
        v.build()
    for r in range(ROUNDS):
        for v in variants:
            v.timed()
    base = variants[0].best
    for v in variants:
        print(f"{v.name:18s} {v.best*1e3:7.3f} ms /24-layer step "
              f"({v.best/LAYERS*1e3:.4f} ms/layer, {v.best/base:.3f}x of int4)",
              flush=True)
