"""Decode throughput vs context length: does ECC overhead grow with context?

The scrubbed read path streams ONLY the int4-packed data prefix of every
page row (kernels/swar.py data-first rows), so protected decode reads the
same KV bytes unprotected int4 reads. As context grows, KV streaming
dominates the step (weights are constant ~1.85 GB), and the protected/
unprotected ratio should hold ~1.0 - the regime where decode-every-read
ECC (the reference's cost model) falls furthest behind.

Method: one cache allocation at max-context capacity per arm (so every
tier reuses ONE compiled decode_loop - block_table shape is static,
context_len is traced), prefill 128 real tokens, then set context_len to
each tier directly: untouched pages hold all-zero words, which are VALID
codewords for every codec (golay/h84 encode 0 -> 0), so the kernel's
stream + decode work is exactly the steady-state shape. Throughput is
content-independent; timed rounds run arm-interleaved (back-to-back
tunnel conditions; CLAUDE.md).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CONTEXTS = [1024, 2048, 4096, 8192]
DECODE_TOKENS = 64
ROUNDS = 3


def main():
    # two arms per run: three 8k-capacity caches resident at once exhaust
    # the 16 GB HBM (measured RESOURCE_EXHAUSTED); the protected arm is
    # always timed back-to-back against the unprotected baseline
    protected = sys.argv[1] if len(sys.argv) > 1 else "int12-golay"
    modes = ["int4-write-inject", protected]

    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.models.config import get_model_config
    from qkv_ecc_tpu.models.kv_policy import policy_for_mode
    from qkv_ecc_tpu.models.registry import init_params
    from qkv_ecc_tpu.models.runtime import (
        decode_loop, init_generation_state, prefill,
    )

    cfg = get_model_config("bench-0.9b")
    batch = 8
    # each tier RESETS context_len to its ctx, then advances it by
    # (1 warmup + ROUNDS) * DECODE_TOKENS during its rounds
    capacity = CONTEXTS[-1] + (1 + ROUNDS) * DECODE_TOKENS + 8
    print(
        f"long-context bench: {cfg.name} on {jax.devices()[0].device_kind}, "
        f"batch={batch} contexts={CONTEXTS} capacity={capacity}",
        file=sys.stderr,
    )

    params = init_params(cfg, 0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 128)))

    # measure THIS session's host-fetch RTT instead of assuming 25 ms: the
    # tunnel's RTT varies by session, and a fixed subtraction biases the
    # absolute ms_per_step (ratios are unaffected - both arms share it)
    probe = jnp.zeros((1,), jnp.int32) + 1
    _ = np.asarray(probe)
    rtts = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe)
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)
    print(f"  host-fetch RTT: {rtt*1e3:.1f} ms", file=sys.stderr)

    class Arm:
        def __init__(self, mode):
            self.mode = mode
            self.policy = policy_for_mode(mode, ber=1e-2, seed=42)
            self.state, self.block_table, _ = init_generation_state(
                cfg, self.policy, batch, capacity
            )
            self.key = jax.random.key(42)

        def compile(self):
            t0 = time.time()
            self.logits, self.state = prefill(
                params, ids, self.state, self.block_table, cfg, self.policy,
                self.key,
            )
            self.logits, self.state, toks = decode_loop(
                params, self.logits, self.state, self.block_table, cfg,
                self.policy, self.key, DECODE_TOKENS,
            )
            _ = np.asarray(toks[-1])
            print(f"  {self.mode}: compile+warmup {time.time()-t0:.0f}s",
                  file=sys.stderr)

        def set_context(self, ctx):
            self.state["context_len"] = jnp.full((batch,), ctx, jnp.int32)

        def run_round(self, r):
            t0 = time.perf_counter()
            self.logits, self.state, toks = decode_loop(
                params, self.logits, self.state, self.block_table, cfg,
                self.policy, jax.random.fold_in(self.key, r), DECODE_TOKENS,
            )
            _ = np.asarray(toks[-1])
            return time.perf_counter() - t0 - rtt  # one measured host fetch

    arms = [Arm(m) for m in modes]
    for a in arms:
        a.compile()

    results = []
    for ctx in CONTEXTS:
        best = {a.mode: float("inf") for a in arms}
        for a in arms:
            a.set_context(ctx)
            a.run_round(999)  # tier warmup (first touch of the new pages)
        # context advances during warmup; keep all arms aligned per round
        for r in range(ROUNDS):
            for a in arms:
                best[a.mode] = min(best[a.mode], a.run_round(r))
        base = best["int4-write-inject"]
        tier = {"context": ctx}
        for a in arms:
            ms = best[a.mode] / DECODE_TOKENS * 1e3
            tier[a.mode] = {
                "ms_per_step": round(ms, 3),
                "tokens_per_sec": round(batch * DECODE_TOKENS / best[a.mode], 1),
                "vs_unprotected": round(base / best[a.mode], 4),
            }
            print(
                f"  ctx={ctx:<6} {a.mode:<18} {ms:7.2f} ms/step "
                f"({base / best[a.mode]:.3f}x of int4)",
                file=sys.stderr,
            )
        results.append(tier)

    device_kind = jax.devices()[0].device_kind
    out = {
        "model": cfg.name,
        "device": device_kind,
        "batch": batch,
        "decode_tokens_per_round": DECODE_TOKENS,
        "rounds": ROUNDS,
        "ber": 1e-2,
        "host_fetch_rtt_ms": round(rtt * 1e3, 2),
        "tiers": results,
    }
    slug = device_kind.lower().replace(" ", "-")
    path = f"results/long_context_{protected}_{slug}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
