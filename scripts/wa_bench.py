"""Microbench the fused write+attend kernel at headline-bench shapes.

Chained 24x per jit (one step's worth of layers), with the VARIANTS'
timed rounds interleaved round-robin (the tunnel drifts minute-to-minute;
back-to-back ratios are the only reliable signal - CLAUDE.md). Variants:

  int4             the unprotected baseline kernel (no parity in the row)
  <codec>          scrub extract path + parity-row RMW (production)
  <codec>-normw    scrub extract path, parity RMW DISABLED (timing knob;
                   isolates the RMW cost - staging DMAs, per-head merges,
                   extra write-backs, the extra pl.when regions)
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
    def __init__(self, codec, scrub, no_rmw=False):
        self.name = codec + ("-normw" if no_rmw else "")
        self.codec, self.scrub, self.no_rmw = codec, scrub, no_rmw
        self.best = float("inf")

    def build(self):
        codec, scrub = self.codec, self.scrub
        q, cache, bt, ctx, cfg = build_decode_attention_case(
            BATCH, HQ, HKV, D, CTX, BS, codec
        )
        if scrub:
            # a scrubbed cache stores only valid codewords; scrub the random
            # words so the extract path's contract holds
            for nm in ("k_cache", "v_cache"):
                w = cache[nm]
                cw = swar.unpack_codewords(codec, np.asarray(w), D, axis=-2)
                cw = swar.scrub_codewords(codec, jnp.asarray(cw))
                cache[nm] = jnp.asarray(
                    swar.pack_codewords(codec, cw, D, axis=-2), jnp.int32
                )
        rw = cache["k_cache"].shape[-2]
        rng = np.random.default_rng(7)
        k_new = jnp.asarray(
            rng.integers(-(2**31), 2**31, (BATCH, HKV, rw), np.int64)
            .astype(np.int32))
        if scrub:
            cwn = swar.scrub_codewords(
                codec, swar.unpack_codewords(codec, k_new, D, axis=-1))
            k_new = jnp.asarray(swar.pack_codewords(codec, cwn, D, axis=-1))
        v_new = k_new
        s_new = jnp.full((BATCH, HKV), 0.1, jnp.float32)
        no_rmw = self.no_rmw

        def step(q, kc, vc, ks, vs):
            for i in range(LAYERS):
                outs = paged_attention_ecc_write_attend(
                    q, k_new, v_new, s_new, s_new, kc, vc, ks, vs,
                    bt, ctx, 0, scrub=scrub, codec=codec, block_size=BS,
                    debug_no_parity_rmw=no_rmw,
                )
                o, kc, vc, ks, vs = outs[:5]
                q = q + o * 1e-9  # serialize layers through q
            return q, kc, vc, ks, vs

        self.f = jax.jit(step, donate_argnums=(1, 2, 3, 4))
        # k_scales and v_scales must be DISTINCT buffers: both are donated
        self.bufs = [cache["k_cache"], cache["v_cache"],
                     cache["k_scales"], cache["v_scales"] + 0]
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
        Variant("hamming84", True, no_rmw=True),
        Variant("golay", True),
        Variant("golay", True, no_rmw=True),
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
