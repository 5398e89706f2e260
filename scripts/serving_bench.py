"""Continuous-batching serving throughput on the real chip.

Drives ContinuousBatchingServer with a mixed-length request stream at bench
shapes and reports aggregate decode throughput + admission overhead. The
server issues ONE decode dispatch per token (host-driven continuous
batching), so on the tunneled chip each step pays the 1-3 ms dispatch RTT
on top of device time - the delta vs bench.py's scanned decode_loop
(zero host round-trips) isolates exactly that serving-loop overhead.

Writes results/serving_tpu.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.models.config import get_model_config
    from qkv_ecc_tpu.models.kv_policy import policy_for_mode
    from qkv_ecc_tpu.models.registry import init_params
    from qkv_ecc_tpu.serving.scheduler import ContinuousBatchingServer, Request

    cfg = get_model_config("bench-0.9b")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(cfg, 0)
    )
    rng = np.random.default_rng(0)

    out = {"model": cfg.name, "device": jax.devices()[0].device_kind,
           "arms": []}
    for mode in ("int12-golay", "int4-write-inject"):
        policy = policy_for_mode(mode, ber=1e-2, seed=42)
        server = ContinuousBatchingServer(
            params, cfg, policy, max_batch=8, max_seq_len=1536,
            prefill_bucket=128, collect_ecc_stats=False,
        )
        # 16 requests, mixed prompt lengths (256..1024), 96 new tokens each:
        # twice the slot count so page recycling + re-admission happen live
        n_req, new_tokens = 16, 96
        for rid in range(n_req):
            plen = int(rng.integers(256, 1025))
            server.add_request(Request(
                rid, rng.integers(0, cfg.vocab_size, (plen,)),
                max_new_tokens=new_tokens,
            ))
        t0 = time.perf_counter()
        outputs = server.run()
        dt = time.perf_counter() - t0
        generated = sum(len(o.token_ids) for o in outputs)
        tps = generated / dt
        rec = {
            "mode": mode,
            "requests": n_req,
            "generated_tokens": generated,
            "wall_s": round(dt, 2),
            "serving_tokens_per_sec": round(tps, 1),
            "note": "host-driven: 1 dispatch/token through the tunnel "
                    "(adds 1-3 ms RTT/step vs the scanned decode_loop)",
        }
        out["arms"].append(rec)
        print(f"  {mode}: {generated} tokens in {dt:.1f}s = {tps:.1f} tok/s "
              f"({len(outputs)} requests completed)", flush=True)
        assert len(outputs) == n_req
        assert all(len(o.token_ids) == new_tokens for o in outputs)

    with open("/root/repo/results/serving_tpu.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
