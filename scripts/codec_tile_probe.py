"""Grid/tile sweep for the standalone golay elementwise kernels (round-5
VERDICT #7: golay decode measured 2.36 GVal/s = 0.67% bandwidth efficiency;
either find >=10x via grid/layout or document the compute-bound ceiling).

The IMLD is ~250 serial int ops per 32-bit lane; the roofline question is
whether the measured rate is grid/pipeline-bound (fixable by tile size) or
issue-bound (the documented ceiling). Chained timing, min of reps.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.evaluation.timing import time_fn_chained
    from qkv_ecc_tpu.kernels import codec_kernels as ck

    n = 16 * 1024 * 1024  # codewords
    rng = np.random.default_rng(0)
    d12 = jnp.asarray(rng.integers(0, 4096, n, dtype=np.int64).astype(np.int32))
    cw = ck.golay_encode_packed_tpu(d12)
    results = {}
    for sub in (64, 128, 256, 512):
        def dec(x, s=sub):
            return ck.golay_decode_packed_tpu(x, sublanes=s)[0]

        def enc(x, s=sub):
            return ck.golay_encode_packed_tpu(x, sublanes=s)

        dt_d = time_fn_chained(dec, cw, iters=8)
        dt_e = time_fn_chained(enc, d12, iters=8)
        gcw_d = n / dt_d / 1e9
        gcw_e = n / dt_e / 1e9
        results[sub] = (gcw_e, gcw_d)
        print(f"sublanes {sub:4d}: encode {gcw_e:6.2f} Gcw/s "
              f"({3*gcw_e:6.2f} GVal/s)   decode {gcw_d:6.2f} Gcw/s "
              f"({3*gcw_d:6.2f} GVal/s)", flush=True)
    best = max(results.items(), key=lambda kv: kv[1][1])
    print(f"best decode tile: sublanes={best[0]} -> "
          f"{3*best[1][1]:.2f} GVal/s", flush=True)


if __name__ == "__main__":
    main()
