"""Decode-loop-level isolation of the protected-write overhead.

Round-5 split data/parity layout: scrub-mode protected arms issue the SAME
contiguous page DMAs as int4 (data arrays are byte-identical) and have no
parity RMW, so the expected remaining gap vs the unprotected floor is ONLY
the fixed per-step encode-chain term (~0.23-0.36 ms in round 4) plus the
deferred parity-column scatter (2 batched jnp scatters/step, ~100 KB).

Run at two context points to decompose fixed vs per-page terms:

    python scripts/rmw_iso.py        # ctx 1024 (the bench point)
    python scripts/rmw_iso.py 64     # weights-only regime: fixed term

delta(ctx64)  = fixed per-step protected overhead
delta(ctx1024) - delta(ctx64) = any residual per-attended-page premium
(target after the split: ~0 - the round-4 strided-DMA and parity-RMW terms
are gone by construction).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH, PROMPT, DECODE = 8, int(sys.argv[1]) if len(sys.argv) > 1 else 1024, 128
ROUNDS = 30


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.models.config import get_model_config
    from qkv_ecc_tpu.models.kv_policy import policy_for_mode
    from qkv_ecc_tpu.models.registry import init_params
    from qkv_ecc_tpu.models.runtime import (
        decode_loop, init_generation_state, prefill,
    )

    cfg = get_model_config("bench-0.9b")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(cfg, 0)
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (BATCH, PROMPT)))

    class Arm:
        def __init__(self, name, mode):
            self.name = name
            self.policy = policy_for_mode(mode, ber=1e-2, seed=42)
            # rounds RESET context_len instead of advancing it, so the
            # capacity (and HBM footprint of the coexisting arms) stays
            # constant regardless of ROUNDS
            self.state, self.block_table, _ = init_generation_state(
                cfg, self.policy, BATCH, PROMPT + 2 * DECODE + 8,
            )
            self.key = jax.random.key(42)
            self.best = float("inf")
            self.times = []

        def warmup(self):
            t0 = time.time()
            self.logits, self.state = prefill(
                params, ids, self.state, self.block_table, cfg, self.policy,
                self.key,
            )
            self.logits, self.state, toks = decode_loop(
                params, self.logits, self.state, self.block_table, cfg,
                self.policy, self.key, DECODE,
            )
            _ = np.asarray(toks[-1])
            print(f"  {self.name}: compile+warmup {time.time()-t0:.0f}s",
                  flush=True)

        def timed(self, r):
            self.state["context_len"] = jnp.full((BATCH,), PROMPT, jnp.int32)
            t0 = time.perf_counter()
            self.logits, self.state, toks = decode_loop(
                params, self.logits, self.state, self.block_table, cfg,
                self.policy, jax.random.fold_in(self.key, r), DECODE,
            )
            _ = np.asarray(toks[-1])
            self.times.append(time.perf_counter() - t0 - 0.025)
            self.best = min(self.best, self.times[-1])

    arms = [
        Arm("int4", "int4-write-inject"),
        Arm("h84", "int4-hamming84"),
        Arm("h74", "int4-hamming"),
        Arm("golay", "int12-golay"),
    ]
    for a in arms:
        a.warmup()
    for r in range(ROUNDS):
        for a in arms:
            a.timed(r)
    base = arms[0].best
    for a in arms:
        ms = a.best / DECODE * 1e3
        t = np.asarray(sorted(a.times)) / DECODE * 1e3
        print(f"{a.name:12s} min {ms:6.3f} p25 {t[len(t)//4]:6.3f} "
              f"med {t[len(t)//2]:6.3f} p75 {t[3*len(t)//4]:6.3f} ms/step "
              f"({base/a.best:.3f}x of int4, delta "
              f"{(a.best-base)/DECODE*1e3:+.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
