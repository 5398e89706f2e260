"""Measure the fully-jitted scanned decode loop at bench shapes.

One dispatch per 128 steps — removes the tunnel's per-dispatch overhead
from the measurement entirely. Also the canary for XLA copying the caches
through the scan carry (step time would balloon to ~50 ms)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.models.config import get_model_config
    from qkv_ecc_tpu.models.kv_policy import policy_for_mode
    from qkv_ecc_tpu.models.registry import init_params
    from qkv_ecc_tpu.models.runtime import (
        decode_loop, init_generation_state, prefill)

    cfg = get_model_config("bench-0.9b")
    batch, prompt_len, steps = 8, 1024, 128
    params = init_params(cfg, 0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, prompt_len)))

    def measure(mode):
        policy = policy_for_mode(mode, ber=1e-2, seed=42)
        state, bt, _ = init_generation_state(
            cfg, policy, batch, prompt_len + 3 * steps + 8
        )
        key = jax.random.key(42)
        t0 = time.time()
        logits, state = prefill(params, ids, state, bt, cfg, policy, key)
        logits, state, toks = decode_loop(
            params, logits, state, bt, cfg, policy, key, steps
        )
        _ = np.asarray(toks[-1])
        print(f"  {mode}: compile+warmup {time.time()-t0:.0f}s", flush=True)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            logits, state, toks = decode_loop(
                params, logits, state, bt, cfg, policy,
                jax.random.fold_in(key, r), steps,
            )
            _ = np.asarray(toks[-1])
            best = min(best, time.perf_counter() - t0 - 0.025)
        ms = best / steps * 1e3
        print(f"  {mode}: {batch*steps/best:.1f} tok/s ({ms:.2f} ms/step)",
              flush=True)
        return batch * steps / best

    g = measure("int12-golay")
    h = measure("int4-hamming84")
    i4 = measure("int4-write-inject")
    print(f"golay vs int4: {g/i4:.3f}   h84 vs int4: {h/i4:.3f}", flush=True)


if __name__ == "__main__":
    main()
