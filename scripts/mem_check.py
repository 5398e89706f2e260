"""Compile-time memory analysis of the decode_loop per cache mode.

If XLA fails to alias a donated cache buffer through the scan (or the
fused kernel's input/output aliasing breaks), the step silently COPIES a
~0.25-0.5 GB cache tensor every iteration - exactly the 0.5-1.5 ms/step
class of overhead seen in the protected arms. AOT-compiles the scanned
decode_loop per mode and prints XLA's memory analysis (temp allocation
size is the tell: it must stay in the tens-of-MB range, NOT cache-sized).
No timed execution - compile only.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

BATCH, PROMPT, DECODE = 8, 1024, 128


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.models.config import get_model_config
    from qkv_ecc_tpu.models.kv_policy import policy_for_mode
    from qkv_ecc_tpu.models.registry import init_params
    from qkv_ecc_tpu.models.runtime import (
        _decode_step_impl, decode_loop, init_generation_state,
    )

    cfg = get_model_config("bench-0.9b")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(cfg, 0)
    )

    for mode in ("int4-write-inject", "int4-hamming84", "int12-golay"):
        policy = policy_for_mode(mode, ber=1e-2, seed=42)
        state, block_table, _ = init_generation_state(
            cfg, policy, BATCH, PROMPT + 2 * DECODE + 8
        )
        state["context_len"] = jnp.full((BATCH,), PROMPT, jnp.int32)
        logits = jnp.zeros((BATCH, cfg.vocab_size), jnp.float32)
        key = jax.random.key(42)
        lowered = decode_loop.lower(
            params, logits, state, block_table, cfg, policy, key, DECODE
        )
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        cache_bytes = state["k_cache"].size * 4
        print(f"{mode}:")
        print(f"  cache tensor bytes      : {cache_bytes/1e6:9.1f} MB each")
        print(f"  argument size           : {m.argument_size_in_bytes/1e6:9.1f} MB")
        print(f"  output size             : {m.output_size_in_bytes/1e6:9.1f} MB")
        print(f"  aliased (in-place) size : {m.alias_size_in_bytes/1e6:9.1f} MB")
        print(f"  TEMP allocation         : {m.temp_size_in_bytes/1e6:9.1f} MB",
              flush=True)
        del state, compiled, lowered


if __name__ == "__main__":
    main()
