"""Measure the decode-step per-layer golay write chain on the chip.

Hypothesis: the 3.9 ms/step golay-vs-int4 gap is the jnp
encode+inject+scrub+pack chain traced per (layer, K/V) - 48 IMLD instances
of ~250 ops each on tiny [8,1,8,44] tensors (latency-bound).
"""
import time
import jax
import jax.numpy as jnp
import numpy as np

from qkv_ecc_tpu.models.kv_policy import policy_for_mode
from qkv_ecc_tpu.kernels import swar
from qkv_ecc_tpu.models.runtime import encode_kv, pack_kv
from qkv_ecc_tpu.evaluation.timing import time_fn_chained

B, HKV, D, LAYERS = 8, 8, 128, 24


def chain_full(policy):
    """24 layers x K/V of the current decode-step write chain."""
    def fn(x):
        key = jax.random.key(0)
        outs = []
        for i in range(LAYERS):
            k = x + i
            v = x - i
            kk = jax.random.fold_in(key, 2 * i)
            vk = jax.random.fold_in(key, 2 * i + 1)
            kc, ks, _ = encode_kv(k, policy, kk)
            vc, vs, _ = encode_kv(v, policy, vk)
            kc = swar.scrub_codewords(policy.codec, kc)
            vc = swar.scrub_codewords(policy.codec, vc)
            kc = pack_kv(kc, policy, D)
            vc = pack_kv(vc, policy, D)
            outs.append(kc.sum() + vc.sum() + ks.sum() + vs.sum())
        return jnp.stack(outs).sum()[None].astype(jnp.float32)
    return fn


def chain_concat(policy):
    """Variant: concatenate K and V before scrub+pack (1 IMLD per layer)."""
    def fn(x):
        key = jax.random.key(0)
        outs = []
        for i in range(LAYERS):
            k = x + i
            v = x - i
            kk = jax.random.fold_in(key, 2 * i)
            vk = jax.random.fold_in(key, 2 * i + 1)
            kc, ks, _ = encode_kv(k, policy, kk)
            vc, vs, _ = encode_kv(v, policy, vk)
            cw = jnp.concatenate([kc, vc], axis=0)
            cw = swar.scrub_codewords(policy.codec, cw)
            w = pack_kv(cw, policy, D)
            outs.append(w.sum() + ks.sum() + vs.sum())
        return jnp.stack(outs).sum()[None].astype(jnp.float32)
    return fn


def chain_noscrub(policy):
    """Variant: no scrub at all (what int4 pays + golay encode)."""
    def fn(x):
        key = jax.random.key(0)
        outs = []
        for i in range(LAYERS):
            k = x + i
            v = x - i
            kk = jax.random.fold_in(key, 2 * i)
            vk = jax.random.fold_in(key, 2 * i + 1)
            kc, ks, _ = encode_kv(k, policy, kk)
            vc, vs, _ = encode_kv(v, policy, vk)
            kc = pack_kv(kc, policy, D)
            vc = pack_kv(vc, policy, D)
            outs.append(kc.sum() + vc.sum() + ks.sum() + vs.sum())
        return jnp.stack(outs).sum()[None].astype(jnp.float32)
    return fn


def main():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 1, HKV, D)),
        jnp.float32,
    )
    for mode in ("int12-golay", "int4-hamming84", "int4-write-inject"):
        policy = policy_for_mode(mode, ber=1e-2, seed=42)
        for name, mk in (
            ("full", chain_full),
            ("concat", chain_concat),
            ("noscrub", chain_noscrub),
        ):
            if name == "concat" and policy.codec == "int4":
                continue
            fn = jax.jit(mk(policy))
            t0 = time.time()
            fn(x).block_until_ready()
            compile_s = time.time() - t0
            dt = time_fn_chained(fn, x, iters=30, warmup=5)
            print(f"{mode:18s} {name:8s} {dt*1e3:7.3f} ms/step-chain "
                  f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
