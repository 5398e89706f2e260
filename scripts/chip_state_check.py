"""On-chip correctness gate for the fused write+attend kernel's DMA paths.

Drives paged_attention_ecc_write_attend directly on the real chip and
checks, for several successive token writes per codec AND per read path
(scrub-extract: data arrays only + jnp parity scatter, exactly the
runtime's split-layout write; decode: data + parity both stream through
the kernel and update via the aliased write-back):
  * cache state (int32 packed codewords + fp32 scales, data AND parity
    arrays) EXACTLY matches a pure-jnp scatter of the same column (computed
    on the same backend, so equality is bit-for-bit), and
  * the attention output matches paged_attention_ecc_reference on the
    post-write cache (bf16 fast-path relative tolerance).

Catches DMA ordering/semaphore bugs (deferred write-back waits, the split
layout's [H, parity_words, bs] page copies with 12/16/17-sublane tiles)
that the CPU interpreter cannot - it validates the real Mosaic lowering.
Every jnp chain is jitted: eager op-by-op dispatch and per-step recompiles
are minutes each through the axon tunnel. Exits nonzero on any mismatch.
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

CODECS = ["golay", "hamming84", "hamming74", "int4"]
STEPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from qkv_ecc_tpu.kernels import swar
    from qkv_ecc_tpu.kernels.paged_attention import (
        paged_attention_ecc_reference,
        paged_attention_ecc_write_attend,
    )

    B, Hkv, Hq, D, bs, pages = 2, 2, 4, 128, 128, 2
    L = 2
    rng = np.random.default_rng(0)
    block_table = jnp.asarray(
        np.arange(B * pages, dtype=np.int32).reshape(B, pages)
    )
    failures = 0
    for codec in CODECS:
        dw = swar.data_words(codec, D)
        pw = swar.parity_words(codec, D)

        @jax.jit
        def build_cache(nib):  # [L, tokens, Hkv, D] -> token-minor pages
            cw = swar.encode_codewords(codec, nib, D)
            rows = swar.pack_codewords(codec, cw, D)
            rows = rows.reshape(L, B * pages, bs, Hkv, -1)
            rows = jnp.transpose(rows, (0, 1, 3, 4, 2))
            return rows[:, :, :, :dw], rows[:, :, :, dw:]

        @jax.jit
        def make_col(nib):  # [B, Hkv, D] -> packed column [B, Hkv, W]
            return swar.pack_codewords(
                codec, swar.encode_codewords(codec, nib, D), D
            )

        @jax.jit
        def expected(kc, vc, kp, vp, ks, vs, col, ksn, vsn, tok):
            slot = tok % bs
            for b in range(B):
                phys_b = jnp.asarray(b * pages, jnp.int32) + tok // bs
                kc = kc.at[0, phys_b, :, :, slot].set(col[b, :, :dw])
                vc = vc.at[0, phys_b, :, :, slot].set(col[b, :, :dw])
                if pw:
                    kp = kp.at[0, phys_b, :, :, slot].set(col[b, :, dw:])
                    vp = vp.at[0, phys_b, :, :, slot].set(col[b, :, dw:])
                ks = ks.at[0, phys_b, :, slot].set(ksn[b])
                vs = vs.at[0, phys_b, :, slot].set(vsn[b])
            return kc, vc, kp, vp, ks, vs

        @jax.jit
        def parity_scatter(kp, vp, col, tok):
            # the runtime's deferred parity write (models/runtime.py)
            slot = tok % bs
            for b in range(B):
                phys_b = jnp.asarray(b * pages, jnp.int32) + tok // bs
                kp = kp.at[0, phys_b, :, :, slot].set(col[b, :, dw:])
                vp = vp.at[0, phys_b, :, :, slot].set(col[b, :, dw:])
            return kp, vp

        @jax.jit
        def compare(got, exp, out, ref):
            state_ok = jnp.asarray(True)
            for g, e in zip(got, exp):
                state_ok = state_ok & jnp.array_equal(g, e)
            o = out.astype(jnp.float32)
            r = ref.astype(jnp.float32)
            return state_ok, jnp.max(jnp.abs(o - r)), jnp.max(jnp.abs(r))

        modes = [("decode", False)] if pw else [("int4", False)]
        if pw and swar.scrub_extract_ok(codec, D):
            modes.insert(0, ("scrub", True))
        for mode_name, scrub in modes:
            nib0 = jnp.asarray(
                rng.integers(0, 16, (L, B * pages * bs, Hkv, D)), jnp.int32
            )
            k_cache, k_parity = build_cache(nib0)
            v_cache, v_parity = build_cache(nib0 ^ 5)
            k_scales = jnp.asarray(
                rng.uniform(0.5, 2.0, (L, B * pages, Hkv, bs)), jnp.float32
            )
            v_scales = k_scales + 0.25

            ctx0 = 130  # token lands mid page 1: overlay + write-back paths
            for step in range(STEPS):
                ctx = jnp.full((B,), ctx0 + step + 1, jnp.int32)
                q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
                nib_new = jnp.asarray(
                    rng.integers(0, 16, (B, Hkv, D)), jnp.int32
                )
                col = make_col(nib_new)
                ks_new = jnp.asarray(
                    rng.uniform(0.5, 2.0, (B, Hkv)), jnp.float32
                )
                vs_new = ks_new * 1.5

                tok = jnp.asarray(ctx0 + step, jnp.int32)
                ek, ev, ekp, evp, eks, evs = expected(
                    k_cache, v_cache, k_parity, v_parity, k_scales, v_scales,
                    col, ks_new, vs_new, tok,
                )
                if scrub:
                    outs = paged_attention_ecc_write_attend(
                        q, col[..., :dw], col[..., :dw], ks_new, vs_new,
                        k_cache, v_cache, k_scales, v_scales,
                        block_table, ctx, 0,
                        codec=codec, block_size=bs, scrub=True,
                    )
                    out, k_cache, v_cache, k_scales, v_scales = outs
                    k_parity, v_parity = parity_scatter(
                        k_parity, v_parity, col, tok
                    )
                elif pw:
                    outs = paged_attention_ecc_write_attend(
                        q, col, col, ks_new, vs_new,
                        k_cache, v_cache, k_scales, v_scales,
                        block_table, ctx, 0, k_parity, v_parity,
                        codec=codec, block_size=bs,
                    )
                    (out, k_cache, v_cache, k_parity, v_parity,
                     k_scales, v_scales) = outs
                else:
                    outs = paged_attention_ecc_write_attend(
                        q, col, col, ks_new, vs_new,
                        k_cache, v_cache, k_scales, v_scales,
                        block_table, ctx, 0,
                        codec=codec, block_size=bs,
                    )
                    out, k_cache, v_cache, k_scales, v_scales = outs
                par = (k_parity, v_parity) if pw else ()
                ref = paged_attention_ecc_reference(
                    q, k_cache, v_cache, k_scales, v_scales, block_table,
                    ctx, 0, *par, codec=codec, block_size=bs,
                )
                got = (k_cache, v_cache, k_scales, v_scales) + par
                exp = (ek, ev, eks, evs) + ((ekp, evp) if pw else ())
                state_ok, diff, rmax = compare(got, exp, out, ref)
                ok_state = bool(state_ok)
                # bf16 fast-path operands: ~2^-8 relative on softmax weights
                ok_out = float(diff) < 0.02 * max(float(rmax), 1.0)
                print(
                    f"{codec:<10} {mode_name:<6} step {step}: state "
                    f"{'OK' if ok_state else 'MISMATCH'}  out maxdiff "
                    f"{float(diff):.4f} {'OK' if ok_out else 'FAIL'}",
                    flush=True,
                )
                failures += (not ok_state) + (not ok_out)
    if failures:
        print(f"FAILED: {failures} mismatches")
        sys.exit(1)
    print("chip state check: ALL OK on", jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
