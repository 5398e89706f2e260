"""Isolate the golay decode-step overhead components (bench shapes).

All runs use the fully-jitted scanned decode loop (one dispatch per 128
steps - no tunnel per-dispatch noise). Grid:

  int4-write-inject @ ber 0      pure weight+KV-streaming floor
  int4-write-inject @ ber 1e-2   + the 4-bit threefry mask chain
  int4-hamming84    @ ber 0      + h84 encode + jnp scrub (no flips)
  int4-hamming84    @ ber 1e-2   + 8-bit mask + jnp h84 scrub
  int12-golay       @ ber 0      + golay encode_wide (clean: no scrub launch)
  int12-golay       @ ber 1e-2   + 24-bit mask + golay_write_scrub_tpu launch

The read path is IDENTICAL for all six (scrub extract-only: 16 data words
per row), so deltas localize the write-path costs.
"""
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

    def measure(mode, ber):
        policy = policy_for_mode(mode, ber=ber, seed=42)
        state, bt, _ = init_generation_state(
            cfg, policy, batch, prompt_len + 4 * steps + 8
        )
        key = jax.random.key(42)
        t0 = time.time()
        logits, state = prefill(params, ids, state, bt, cfg, policy, key)
        logits, state, toks = decode_loop(
            params, logits, state, bt, cfg, policy, key, steps
        )
        _ = np.asarray(toks[-1])
        compile_s = time.time() - t0
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
        print(f"  {mode:<22s} ber={ber:<6g} {ms:6.2f} ms/step "
              f"(compile {compile_s:.0f}s)", flush=True)
        return ms

    grid = [
        ("int4-write-inject", 0.0),
        ("int4-write-inject", 1e-2),
        ("int4-hamming84", 0.0),
        ("int4-hamming84", 1e-2),
        ("int12-golay", 0.0),
        ("int12-golay", 1e-2),
    ]
    out = {}
    for mode, ber in grid:
        out[(mode, ber)] = measure(mode, ber)
    base = out[("int4-write-inject", 1e-2)]
    print(f"\n  h84/int4  @1e-2: {base/out[('int4-hamming84', 1e-2)]:.3f}x inv"
          f" -> ratio {out[('int4-hamming84', 1e-2)]/base:.3f}")
    print(f"  golay/int4@1e-2: ratio {out[('int12-golay', 1e-2)]/base:.3f}")
    print(f"  golay inject+scrub cost: "
          f"{out[('int12-golay', 1e-2)] - out[('int12-golay', 0.0)]:.2f} ms")
    print(f"  h84 inject+scrub cost:   "
          f"{out[('int4-hamming84', 1e-2)] - out[('int4-hamming84', 0.0)]:.2f} ms")
    print(f"  int4 inject cost:        "
          f"{out[('int4-write-inject', 1e-2)] - out[('int4-write-inject', 0.0)]:.2f} ms")


if __name__ == "__main__":
    main()
