"""Scaling-efficiency measurement: decode tokens/s across mesh shapes.

The BASELINE.json north star asks for "tokens/s scaling at 1 chip, 1 host,
>= 2 hosts". This container exposes ONE physical TPU chip, so the harness
measures what is measurable and keeps the methodology identical across
tiers:

  * single device, no mesh        - models/runtime.py decode loop
  * (data, model) in-process mesh - parallel/tp_runtime.py shard_map step
    (on the chip this gives the tp=1 shard_map overhead; on the CPU backend
    with --xla_force_host_platform_device_count=8 it gives RELATIVE weak-
    scaling efficiency across 1..8 virtual devices - absolute CPU numbers
    are meaningless, the ratio between mesh shapes is the measurement)
  * >= 2 hosts                    - parallel/multihost.py (jax.distributed +
    gloo), same step functions, 2 real processes

Weak scaling: the global batch is batch_per_data * data_axis, so per-device
decode work is constant as the data axis grows; perfect data scaling is a
flat ms/step and tokens/s growing linearly with the axis. The model axis
strong-scales the attention heads / MLP shards against two psums per layer.

Artifacts: one JSON dict per mesh shape (results/scaling_*.json via --output).
No reference counterpart (single-GPU reference, SURVEY.md §2.9).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def _mesh(data: int, model: int):
    import jax
    from jax.sharding import Mesh

    need = data * model
    devs = jax.devices()
    if len(devs) < need:
        raise ValueError(f"mesh {data}x{model} needs {need} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs[:need]).reshape(data, model), ("data", "model"))


def measure_single_device(cfg, policy, *, batch, prompt_len, steps,
                          block_size, warmup=5):
    """tokens/s of the plain (unsharded) jitted decode loop."""
    import jax
    import jax.numpy as jnp

    from ..models.registry import init_params
    from ..models.runtime import decode_step, init_generation_state, prefill

    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        init_params(cfg, 0),
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, prompt_len)))
    state, bt, _ = init_generation_state(
        cfg, policy, batch, prompt_len + steps + warmup + 8,
        block_size=block_size,
    )
    key = jax.random.key(policy.seed)
    logits, state = prefill(params, ids, state, bt, cfg, policy, key)
    tok = jnp.argmax(logits, -1)
    for w in range(warmup):
        logits, state = decode_step(
            params, tok, state, bt, cfg, policy,
            jax.random.fold_in(key, w), block_size=block_size,
        )
        tok = jnp.argmax(logits, -1)
    np.asarray(tok)
    t0 = time.perf_counter()
    for s in range(steps):
        logits, state = decode_step(
            params, tok, state, bt, cfg, policy,
            jax.random.fold_in(key, 1000 + s), block_size=block_size,
        )
        tok = jnp.argmax(logits, -1)
    np.asarray(tok)
    dt = (time.perf_counter() - t0) / steps
    return {"tier": "single-device", "mesh": "1", "batch": batch,
            "ms_per_step": dt * 1e3, "tokens_per_s": batch / dt}


def measure_tp_mesh(cfg, policy, *, data=None, model=None, batch_per_data,
                    prompt_len, steps, block_size, warmup=5, mesh=None,
                    tier="in-process-mesh"):
    """tokens/s of the shard_map'ed TP+DP decode step on a (data, model)
    mesh (weak scaling over `data`, strong over `model`). Pass `mesh` to
    measure an existing (possibly multi-host) mesh - with a multihost mesh
    every process calls this collectively (multi-controller SPMD) and gets
    the same global numbers."""
    import jax
    import jax.numpy as jnp

    from ..models.registry import init_params
    from ..parallel.sharding import shard_params
    from ..parallel.tp_runtime import make_tp_functions

    if mesh is None:
        mesh = _mesh(data, model)
    data, model = mesh.shape["data"], mesh.shape["model"]
    batch = batch_per_data * data
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        init_params(cfg, 0),
    )
    params = shard_params(params, cfg, mesh)
    init_state, prefill_fn, decode_fn = make_tp_functions(
        cfg, policy, mesh, block_size
    )
    state, bt = init_state(batch, prompt_len + steps + warmup + 8)
    rng = np.random.default_rng(0)
    from jax.sharding import NamedSharding, PartitionSpec as P

    ids = jax.device_put(
        jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, prompt_len))),
        NamedSharding(mesh, P("data")),
    )
    key = jax.random.key(policy.seed)
    logits, state = prefill_fn(
        params, ids, state, bt, key,
        jnp.full((batch,), prompt_len - 1, jnp.int32),
        jnp.full((batch,), prompt_len, jnp.int32),
    )

    @jax.jit
    def pick(lg):
        return jnp.argmax(lg, -1).astype(jnp.int32)

    tok = pick(logits)
    for w in range(warmup):
        logits, state = decode_fn(params, tok, state, bt,
                                  jax.random.fold_in(key, w))
        tok = pick(logits)
    jax.block_until_ready(tok)
    t0 = time.perf_counter()
    for s in range(steps):
        logits, state = decode_fn(params, tok, state, bt,
                                  jax.random.fold_in(key, 1000 + s))
        tok = pick(logits)
    jax.block_until_ready(tok)
    dt = (time.perf_counter() - t0) / steps
    return {"tier": tier, "mesh": f"{data}x{model}",
            "batch": batch, "ms_per_step": dt * 1e3,
            "tokens_per_s": batch / dt}


def scaling_efficiency(rows):
    """Annotate weak-scaling efficiency vs the smallest data axis at each
    model-axis size: eff = (tok/s) / (tok/s_base * data/data_base)."""
    by_model = {}
    for r in rows:
        if r["tier"] != "in-process-mesh":
            continue
        d, m = (int(x) for x in r["mesh"].split("x"))
        by_model.setdefault(m, []).append((d, r))
    for m, drs in by_model.items():
        drs.sort()
        d0, r0 = drs[0]
        for d, r in drs:
            ideal = r0["tokens_per_s"] * d / d0
            r["weak_scaling_efficiency"] = r["tokens_per_s"] / ideal
    return rows


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="tiny-llama")
    ap.add_argument("--mode", default="int12-golay")
    ap.add_argument("--ber", type=float, default=1e-2)
    ap.add_argument("--meshes", default="1x1,2x1,4x1,8x1,1x2,2x2",
                    help="comma-separated DATAxMODEL shapes; 'single' for "
                         "the unsharded loop")
    ap.add_argument("--batch-per-data", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--block-size", type=int, default=None,
                    help="default: 128 on TPU, 16 elsewhere")
    ap.add_argument("--output", default=None)
    args = ap.parse_args(argv)

    import jax

    from ..models.config import get_model_config
    from ..models.kv_policy import policy_for_mode

    cfg = get_model_config(args.model)
    policy = policy_for_mode(args.mode, ber=args.ber, seed=42)
    platform = jax.devices()[0].platform
    bs = args.block_size or (128 if platform == "tpu" else 16)

    rows = []
    for spec in args.meshes.split(","):
        spec = spec.strip()
        if spec in ("single", "1"):
            r = measure_single_device(
                cfg, policy, batch=args.batch_per_data,
                prompt_len=args.prompt_len, steps=args.steps, block_size=bs,
            )
        else:
            d, m = (int(x) for x in spec.split("x"))
            r = measure_tp_mesh(
                cfg, policy, data=d, model=m,
                batch_per_data=args.batch_per_data,
                prompt_len=args.prompt_len, steps=args.steps, block_size=bs,
            )
        r.update(model=cfg.name, mode=args.mode, ber=args.ber,
                 platform=platform, block_size=bs)
        print(json.dumps(r), flush=True)
        rows.append(r)
    rows = scaling_efficiency(rows)
    out = {"config": vars(args), "platform": platform, "rows": rows}
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.output}", flush=True)
    return out


if __name__ == "__main__":
    main()
