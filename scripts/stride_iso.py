"""Isolate the STRIDED-chunk-DMA cost of the protected cache layout.

rmw_iso.py (round 4) shows the protected arms pay ~1.0-1.2 ms/step beyond
the unprotected floor even with parity RMW disabled and scrub-folded
(near-int4) encode chains. The remaining structural difference is the DMA
pattern: scrub-mode reads stream the 16-word data PREFIX of each 32/33-word
row - per (page, head) an 8 KB run with an 8-8.5 KB hole - while int4 pages
are fully contiguous 64 KB blocks.

This probes exactly that, with everything else held constant: the SAME
int4 codec + scrub extract path, on caches whose rows are
  16 words (contiguous - the int4 layout)
  32 words, data in the 16-word prefix (the hamming84 layout)
  33 words (the golay layout; odd stride)
All variants stream the same 16 words/row; only the stride differs.
debug_no_parity_rmw skips the parity merge so the write path is identical
too. 24 chained launches per dispatch, variants' rounds interleaved,
30 rounds, p25/med quantiles (the rmw_iso methodology).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH, HQ, HKV, D, CTX, BS = 8, 16, 8, 128, 1024, 128
LAYERS = 24
ROUNDS = 30


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.benchmarks.harness import build_decode_attention_case
    from qkv_ecc_tpu.kernels.paged_attention import (
        paged_attention_ecc_write_attend,
    )

    class Variant:
        def __init__(self, name, row_words, scrub):
            self.name, self.rw, self.scrub = name, row_words, scrub
            self.times = []

        def build(self):
            q, cache, bt, ctx, cfg = build_decode_attention_case(
                BATCH, HQ, HKV, D, CTX, BS, "int4"
            )
            pad = self.rw - cache["k_cache"].shape[-2]
            if pad:
                zeros = [(0, 0)] * 3 + [(0, pad), (0, 0)]
                cache["k_cache"] = jnp.pad(cache["k_cache"], zeros)
                cache["v_cache"] = jnp.pad(cache["v_cache"], zeros)
            rng = np.random.default_rng(7)
            k_new = jnp.asarray(rng.integers(
                0, 16, (BATCH, HKV, self.rw), np.int64).astype(np.int32))
            v_new = k_new
            s_new = jnp.full((BATCH, HKV), 0.1, jnp.float32)
            scrub = self.scrub

            def step(q, kc, vc, ks, vs):
                for i in range(LAYERS):
                    outs = paged_attention_ecc_write_attend(
                        q, k_new, v_new, s_new, s_new, kc, vc, ks, vs,
                        bt, ctx, 0, scrub=scrub, codec="int4", block_size=BS,
                        debug_no_parity_rmw=True,
                    )
                    o, kc, vc, ks, vs = outs[:5]
                    q = q + o * 1e-9  # serialize layers through q
                return q, kc, vc, ks, vs

            self.f = jax.jit(step, donate_argnums=(1, 2, 3, 4))
            self.bufs = [cache["k_cache"], cache["v_cache"],
                         cache["k_scales"], cache["v_scales"] + 0]
            self.q = jnp.zeros((BATCH, HQ, D), jnp.float32)
            t0 = time.time()
            self._run()
            print(f"  {self.name}: compile {time.time()-t0:.0f}s", flush=True)

        def _run(self):
            self.q, *self.bufs = self.f(self.q, *self.bufs)
            np.asarray(self.q[0, 0, 0])

        def timed(self):
            t0 = time.perf_counter()
            self._run()
            self.times.append(time.perf_counter() - t0 - 0.025)

    variants = [
        Variant("row16-contig", 16, scrub=False),
        Variant("row32-prefix16", 32, scrub=True),
        Variant("row33-prefix16", 33, scrub=True),
        Variant("row32-full", 32, scrub=False),  # 2x bytes, contiguous
    ]
    for v in variants:
        v.build()
    for r in range(ROUNDS):
        for v in variants:
            v.timed()
    base = min(variants[0].times)
    for v in variants:
        t = np.asarray(sorted(v.times)) * 1e3
        print(f"{v.name:16s} min {t[0]:7.3f} p25 {t[len(t)//4]:7.3f} "
              f"med {t[len(t)//2]:7.3f} ms /24 launches "
              f"({t[0]/1e3/base:.3f}x of contig)", flush=True)


if __name__ == "__main__":
    main()
