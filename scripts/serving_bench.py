"""Continuous-batching serving throughput on the real chip (VERDICT r3 #3).

Drives ContinuousBatchingServer with a mixed-length request stream at bench
shapes across modes x batch levels and reports, per arm:
  * aggregate serving throughput (generated tokens / wall),
  * steady-state decode-step latency (steps with all slots active and no
    admission that step),
  * admission (prefill) latency per admitted request,
  * per-mode overhead vs the unprotected int4 arm at the same batch level.

The server issues ONE decode dispatch per token (host-driven continuous
batching), so on the tunneled chip each step pays the 1-3 ms dispatch RTT
on top of device time - the delta vs bench.py's scanned decode_loop (zero
host round-trips) isolates exactly that serving-loop overhead. Matches the
reference's throughput arms (fault_tolerance_benchmark.py:1109) in role.

Writes results/serving_bench_<device>.json.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

MODES = ("int4-write-inject", "int4-hamming84", "int12-golay")
PROMPT_LEN = 512
BATCH_LEVELS = (4, 8)
NEW_TOKENS = 96


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.models.config import get_model_config
    from qkv_ecc_tpu.models.kv_policy import policy_for_mode
    from qkv_ecc_tpu.models.registry import init_params
    from qkv_ecc_tpu.serving.scheduler import (
        ContinuousBatchingServer, Request,
    )

    cfg = get_model_config("bench-0.9b")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_params(cfg, 0)
    )
    device_kind = jax.devices()[0].device_kind
    slug = device_kind.lower().replace(" ", "-")

    class TimedServer(ContinuousBatchingServer):
        """Instrumented: per-admission prefill latency + per-step decode
        latency tagged with (active slots, admissions this step)."""

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.admission_s = []
            self.step_records = []  # (active, admitted, seconds)

        def _run_prefill(self, ids, row, key, logit_pos, true_len):
            t0 = time.perf_counter()
            logits = super()._run_prefill(ids, row, key, logit_pos, true_len)
            _ = np.asarray(logits[:, :1])  # force completion (one RTT)
            self.admission_s.append(time.perf_counter() - t0)
            return logits

        def step(self):
            before = len(self.admission_s)
            t0 = time.perf_counter()
            out = super().step()
            dt = time.perf_counter() - t0
            admitted = len(self.admission_s) - before
            self.step_records.append((self.num_active, admitted, dt))
            return out

    out = {"model": cfg.name, "device": device_kind,
           "new_tokens_per_request": NEW_TOKENS, "arms": []}
    base_tps = {}
    for max_batch in BATCH_LEVELS:
        for mode in MODES:
            policy = policy_for_mode(mode, ber=1e-2, seed=42)
            server = TimedServer(
                params, cfg, policy, max_batch=max_batch, max_seq_len=1536,
                prefill_bucket=128, collect_ecc_stats=False,
            )
            rng = np.random.default_rng(0)  # same stream for every arm
            # warmup request: compiles the (single-bucket) prefill and the
            # decode step BEFORE the timed stream - admission latency then
            # measures steady prefill, not XLA compiles
            server.add_request(Request(
                10_000, rng.integers(0, cfg.vocab_size, (PROMPT_LEN,)),
                max_new_tokens=4,
            ))
            server.run()
            server.finished.clear()
            server.admission_s.clear()
            server.step_records.clear()
            # 2x the slot count so page recycling + re-admission happen live;
            # ONE prompt length = one prefill bucket (distinct buckets each
            # pay a fresh ~30 s XLA compile through the tunnel, which would
            # dominate the wall clock and pollute admission stats)
            n_req = 2 * max_batch
            for rid in range(n_req):
                server.add_request(Request(
                    rid, rng.integers(0, cfg.vocab_size, (PROMPT_LEN,)),
                    max_new_tokens=NEW_TOKENS,
                ))
            t0 = time.perf_counter()
            outputs = server.run()
            dt = time.perf_counter() - t0
            generated = sum(len(o.token_ids) for o in outputs)
            assert len(outputs) == n_req
            assert all(len(o.token_ids) == NEW_TOKENS for o in outputs)
            tps = generated / dt
            # steady state: full batch active, nothing admitted that step
            steady = [
                s for a, adm, s in server.step_records
                if a == max_batch and adm == 0
            ]
            adm = sorted(server.admission_s)
            rec = {
                "mode": mode,
                "max_batch": max_batch,
                "requests": n_req,
                "generated_tokens": generated,
                "wall_s": round(dt, 2),
                "serving_tokens_per_sec": round(tps, 1),
                "steady_decode_ms_per_step": round(
                    float(np.median(steady)) * 1e3, 2) if steady else None,
                "steady_steps_measured": len(steady),
                "admission_latency_ms": {
                    "median": round(float(np.median(adm)) * 1e3, 1),
                    "p90": round(float(adm[int(0.9 * len(adm))]) * 1e3, 1),
                } if adm else None,
                "note": "host-driven: 1 dispatch/token through the tunnel "
                        "(adds 1-3 ms RTT/step vs the scanned decode_loop)",
            }
            if mode == "int4-write-inject":
                base_tps[max_batch] = tps
            rec["vs_unprotected"] = round(tps / base_tps[max_batch], 4)
            out["arms"].append(rec)
            # write incrementally: a timeout mid-run still leaves a valid
            # artifact with the arms measured so far
            with open(f"/root/repo/results/serving_bench_{slug}.json", "w") as f:
                json.dump(out, f, indent=2)
                f.write("\n")
            print(f"  b={max_batch} {mode}: {generated} tok in {dt:.1f}s = "
                  f"{tps:.1f} tok/s ({rec['vs_unprotected']}x), steady "
                  f"{rec['steady_decode_ms_per_step']} ms/step, admission "
                  f"{rec['admission_latency_ms']}", flush=True)

    path = f"/root/repo/results/serving_bench_{slug}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
