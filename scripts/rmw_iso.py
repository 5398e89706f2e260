"""Decode-loop-level isolation of the protected-write overhead.

bench.py (round 4, post scrub-fold) still shows golay ~0.78x / h84 ~0.83x
of the 4.35 ms unprotected floor; the kernel microbench (wa_bench) cannot
resolve the gap reliably. This measures the FULL scanned decode_loop with
the parity-RMW debug knob toggled per arm, all arms interleaved round-robin:

  int4           the unprotected floor
  h84 / golay    production scrub path (parity RMW on)
  *-normw        identical except the kernel skips the parity-row RMW
                 (staging DMAs, per-head merges, extra write-backs, the
                 extra pl.when region) - stale parity, timing only

delta(codec) - delta(codec-normw) = the parity RMW's true step cost;
delta(codec-normw) vs int4 = everything else (encode chain, mask deltas,
kernel decode/extract differences).
"""
import dataclasses
import sys
import time

# usage: rmw_iso.py [prompt_len]  (default 1024; 64 isolates the FIXED
# per-layer protected overhead - encode chain, operand materialization,
# pl.when regions - from the per-page stride/DMA costs that scale with
# context)

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
        def __init__(self, name, mode, no_rmw=False):
            self.name = name
            self.policy = policy_for_mode(mode, ber=1e-2, seed=42)
            if no_rmw:
                self.policy = dataclasses.replace(
                    self.policy, debug_no_parity_rmw=True
                )
            # rounds RESET context_len instead of advancing it, so the
            # capacity (and HBM footprint of 5 coexisting arms) stays
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
        Arm("h84-normw", "int4-hamming84", no_rmw=True),
        Arm("golay", "int12-golay"),
        Arm("golay-normw", "int12-golay", no_rmw=True),
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
              f"({base/a.best:.3f}x of int4)", flush=True)


if __name__ == "__main__":
    main()
