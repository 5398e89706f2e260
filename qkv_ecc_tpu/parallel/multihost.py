"""Multi-host (multi-process) execution over jax.distributed.

The reference is strictly single-GPU (SURVEY.md §2.9); this module is new
TPU-native infrastructure completing the distributed story: §5.8's
"distributed comms backend" beyond a single process. Design:

  * One JAX process per host. `initialize_multihost` brings up the
    jax.distributed coordinator (DCN); on the CPU backend it selects the
    gloo cross-process collectives implementation so the SAME code paths
    are testable in-container with 2 spawned processes x 4 virtual
    devices (tests/test_multihost.py) - on real TPU pods the PJRT TPU
    client provides ICI/DCN collectives natively and no flag is needed.
  * `multihost_mesh` lays the ("data", "model") mesh out so the model
    (tensor-parallel) axis stays WITHIN a host - its two psums/layer ride
    ICI - and the data axis spans hosts, so only per-step logits/token
    traffic crosses DCN.
  * `generate_tp_multihost` is the multi-controller variant of
    tp_runtime.generate_tp: every process executes the same jitted step
    program; the sampled token stays ON DEVICE between steps (a host
    round-trip per token would both serialize DCN and crash: data-sharded
    arrays are not fully addressable from any single process), and the
    final token matrix is process_allgather'ed so every host returns the
    full batch.

Run a 2-process demo (per process):
    python -m qkv_ecc_tpu.parallel.multihost \
        --coordinator localhost:29801 --num-processes 2 --process-id {0,1}
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: int | None = None,
):
    """Bring up jax.distributed for a multi-process run.

    On CPU (the in-container test environment) forces
    --xla_force_host_platform_device_count and the gloo collectives
    implementation BEFORE backend initialization. Returns
    (process_count, process_index)."""
    import os

    if local_device_count is not None:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_device_count}"
        )
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count(), jax.process_index()


def multihost_mesh(model: int | None = None) -> Mesh:
    """("data", "model") mesh with data = hosts (DCN), model = per-host
    devices (ICI). jax.devices() is process-major, so rows of the device
    grid are exactly the hosts."""
    nproc = jax.process_count()
    local = jax.local_device_count()
    if model is None:
        model = local
    if model > local:
        raise ValueError(
            f"model axis {model} exceeds local device count {local}: the "
            "TP axis must stay within one host so its collectives ride ICI"
        )
    devs = np.array(jax.devices()).reshape(nproc, local)[:, :model]
    return Mesh(devs, ("data", "model"))


def generate_tp_multihost(
    params,
    input_ids,
    cfg,
    policy,
    mesh: Mesh,
    max_new_tokens: int = 16,
    block_size: int = 128,
):
    """Greedy TP+DP generation across hosts; returns the FULL [B, S+new]
    token matrix on every process (multi-controller SPMD).

    Differences from the single-process generate_tp: the argmax'd next
    token never touches the host mid-loop, and the result is gathered
    with process_allgather at the end."""
    from jax.experimental import multihost_utils

    from .sharding import shard_params
    from .tp_runtime import make_tp_functions

    params = shard_params(params, cfg, mesh)
    input_ids = jnp.asarray(input_ids)
    B, S = input_ids.shape
    init_state, prefill_fn, decode_fn = make_tp_functions(
        cfg, policy, mesh, block_size
    )
    state, block_table = init_state(B, S + max_new_tokens)
    key = jax.random.key(policy.seed)
    ids_sharded = jax.device_put(
        input_ids, NamedSharding(mesh, P("data"))
    )

    @jax.jit
    def pick(logits):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits, state = prefill_fn(
        params, ids_sharded, state, block_table, key,
        jnp.full((B,), S - 1, jnp.int32), jnp.full((B,), S, jnp.int32),
    )
    toks = [pick(logits)]
    for step in range(max_new_tokens - 1):
        logits, state = decode_fn(
            params, toks[-1], state, block_table,
            jax.random.fold_in(key, S + step),
        )
        toks.append(pick(logits))

    @jax.jit
    def stack(ts):
        return jnp.stack(ts, axis=1)  # [B, new], data-sharded on B

    gen = stack(toks)
    full = multihost_utils.process_allgather(gen, tiled=True)  # np [B, new]
    return np.concatenate([np.asarray(input_ids), np.asarray(full)], axis=1)


def serve_demo_requests(vocab_size: int):
    """The deterministic request stream used by the multi-host serving demo
    AND its single-process oracle (tests/test_multihost.py): more requests
    than batch slots, mixed prompt lengths, so the run exercises staggered
    admission and page recycling across hosts."""
    from ..serving import Request

    rng = np.random.default_rng(23)
    return [
        Request(i, rng.integers(0, vocab_size, (n,)), max_new_tokens=m)
        for i, (n, m) in enumerate([(7, 5), (13, 4), (5, 6), (9, 3)])
    ]


def _demo(args):
    """2-process verification demo: tiny llama, golay cache at BER 1e-2."""
    import dataclasses

    initialize_multihost(
        args.coordinator, args.num_processes, args.process_id,
        local_device_count=args.local_devices,
    )
    from ..models.config import TINY_LLAMA
    from ..models.kv_policy import policy_for_mode
    from ..models.registry import init_params

    cfg = dataclasses.replace(TINY_LLAMA, name="multihost-demo")
    params = init_params(cfg, 0)  # same seed on every process
    policy = policy_for_mode(args.mode, ber=args.ber, seed=42)
    mesh = multihost_mesh(model=args.model_axis)
    print(
        f"proc {jax.process_index()}/{jax.process_count()} "
        f"mesh data={mesh.shape['data']} model={mesh.shape['model']}",
        flush=True,
    )

    if args.serve:
        # continuous batching across hosts: every process runs the identical
        # scheduler loop; tokens are allgathered once per step
        from ..serving import MultihostTPContinuousBatchingServer

        server = MultihostTPContinuousBatchingServer(
            params, cfg, policy, mesh,
            max_batch=2, max_seq_len=64, block_size=args.block_size,
            prefill_bucket=16,
        )
        for req in serve_demo_requests(cfg.vocab_size):
            server.add_request(req)
        outputs = sorted(server.run(), key=lambda o: o.request_id)
        for o in outputs:
            print(
                f"REQ {o.request_id} "
                + ",".join(str(int(t)) for t in o.token_ids),
                flush=True,
            )
        return

    if args.bench_steps:
        # multi-host tier of the scaling measurement (benchmarks/scaling.py):
        # every process runs the identical timed loop; the printed global
        # tokens/s is the cross-host serving rate
        import json as _json

        from ..benchmarks.scaling import measure_tp_mesh

        row = measure_tp_mesh(
            cfg, policy, mesh=mesh, batch_per_data=args.bench_batch_per_data,
            prompt_len=64, steps=args.bench_steps,
            block_size=args.block_size, tier=f"multihost-{args.num_processes}p",
        )
        print("BENCH " + _json.dumps(row), flush=True)
        return

    rng = np.random.default_rng(11)
    prompt = rng.integers(0, cfg.vocab_size, (jax.process_count(), 9))
    out = generate_tp_multihost(
        params, prompt, cfg, policy, mesh,
        max_new_tokens=args.max_new_tokens, block_size=args.block_size,
    )
    print("TOKENS " + ",".join(str(int(t)) for t in out.reshape(-1)),
          flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--model-axis", type=int, default=2)
    ap.add_argument("--mode", default="int12-golay")
    ap.add_argument("--ber", type=float, default=1e-2)
    ap.add_argument("--max-new-tokens", type=int, default=6)
    ap.add_argument("--block-size", type=int, default=16)
    ap.add_argument("--serve", action="store_true",
                    help="run the multi-host continuous-batching server "
                         "demo instead of plain generation")
    ap.add_argument("--bench-steps", type=int, default=0,
                    help="time this many TP decode steps across hosts and "
                         "print a scaling-measurement row instead of "
                         "generating")
    ap.add_argument("--bench-batch-per-data", type=int, default=4)
    _demo(ap.parse_args())
