"""Decompose the golay inject+scrub write cost: threefry mask vs Pallas launch.

Variants (monkeypatched, perf-only - B/C/D corrupt semantics):
  A: current code                          (mask + 48 scrub launches)
  B: zero mask                             (no threefry; launches remain)
  C: jnp encode^mask instead of the launch (threefry remains; no launch/IMLD)
  D: B+C                                   (should match golay @ ber=0)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.models import kv_policy
    from qkv_ecc_tpu.models.config import get_model_config
    from qkv_ecc_tpu.models.kv_policy import policy_for_mode
    from qkv_ecc_tpu.models.registry import init_params
    from qkv_ecc_tpu.models.runtime import (
        decode_loop, init_generation_state, prefill)
    from qkv_ecc_tpu.kernels import swar

    cfg = get_model_config("bench-0.9b")
    batch, prompt_len, steps = 8, 1024, 128
    params = init_params(cfg, 0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, prompt_len)))

    real_mask = kv_policy.flip_mask_for
    real_scrub = kv_policy.golay_write_scrub_tpu

    def zero_mask(key, shape, ber, n_bits):
        return jnp.zeros(shape, jnp.int32)

    def jnp_scrubless(d12, mask):
        return swar.golay_encode_wide(d12) ^ mask

    def measure(tag, seed, mask_fn, scrub_fn):
        kv_policy.flip_mask_for = mask_fn
        kv_policy.golay_write_scrub_tpu = scrub_fn
        try:
            policy = policy_for_mode("int12-golay", ber=1e-2, seed=seed)
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
            c = time.time() - t0
            best = float("inf")
            for r in range(3):
                t0 = time.perf_counter()
                logits, state, toks = decode_loop(
                    params, logits, state, bt, cfg, policy,
                    jax.random.fold_in(key, r), steps,
                )
                _ = np.asarray(toks[-1])
                best = min(best, time.perf_counter() - t0 - 0.025)
            print(f"  {tag}: {best/steps*1e3:6.2f} ms/step (compile {c:.0f}s)",
                  flush=True)
        finally:
            kv_policy.flip_mask_for = real_mask
            kv_policy.golay_write_scrub_tpu = real_scrub

    measure("A current            ", 142, real_mask, real_scrub)
    measure("B zero-mask          ", 143, zero_mask, real_scrub)
    measure("C jnp encode^mask    ", 144, real_mask, jnp_scrubless)
    measure("D zero-mask + no-IMLD", 145, zero_mask, jnp_scrubless)


if __name__ == "__main__":
    main()
