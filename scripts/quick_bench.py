"""Quick golay-vs-int4 decode-step measurement (bench.py shapes, 1 round)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.models.config import get_model_config
    from qkv_ecc_tpu.models.kv_policy import policy_for_mode
    from qkv_ecc_tpu.models.registry import init_params
    from qkv_ecc_tpu.models.runtime import decode_step, init_generation_state, prefill

    cfg = get_model_config("bench-0.9b")
    batch, prompt_len, decode_tokens = 8, 1024, 128
    params = init_params(cfg, 0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, prompt_len)))

    def measure(mode):
        policy = policy_for_mode(mode, ber=1e-2, seed=42)
        # capacity covers every decoded token (10 warmup + 2 timed rounds)
        state, block_table, _ = init_generation_state(
            cfg, policy, batch, prompt_len + 10 + 2 * decode_tokens + 8
        )
        key = jax.random.key(42)
        t0 = time.time()
        logits, state = prefill(params, ids, state, block_table, cfg, policy, key)
        for w in range(10):
            logits, state = decode_step(
                params, jnp.argmax(logits, axis=-1), state, block_table, cfg,
                policy, jax.random.fold_in(key, 100000 + w),
            )
        _ = np.asarray(logits)
        print(f"  {mode}: compile+warmup {time.time()-t0:.0f}s", flush=True)
        best = float("inf")
        for _round in range(2):
            t0 = time.perf_counter()
            for step in range(decode_tokens):
                logits, state = decode_step(
                    params, jnp.argmax(logits, axis=-1), state, block_table,
                    cfg, policy, jax.random.fold_in(key, step),
                )
            _ = np.asarray(logits)
            best = min(best, time.perf_counter() - t0 - 0.025)
        ms = best / decode_tokens * 1e3
        print(f"  {mode}: {batch*decode_tokens/best:.1f} tok/s ({ms:.2f} ms/step)",
              flush=True)
        return batch * decode_tokens / best

    g = measure("int12-golay")
    i4 = measure("int4-write-inject")
    print(f"golay vs int4: {g/i4:.3f}", flush=True)


if __name__ == "__main__":
    main()
