"""ECC patrol scrubbing (kernels/paged_attention.py scrub mode).

Scrubbing must be OBSERVATIONALLY INVISIBLE: decode corrections are
deterministic and idempotent, so correcting a dirty page once and writing
the corrected codewords back (uncorrectable Golay -> all-zero codeword)
yields bit-identical attention outputs to decode-at-every-read, while the
steady-state decode cost drops to an extract-only fast path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qkv_ecc_tpu.models.config import TINY_LLAMA
from qkv_ecc_tpu.models.kv_policy import policy_for_mode
from qkv_ecc_tpu.models.registry import init_params
from qkv_ecc_tpu.models.runtime import (
    decode_step,
    init_generation_state,
    prefill,
)

MODES = ["int12-golay", "int4-hamming84", "int4-hamming"]


def _run(params, cfg, mode, ber, scrub, steps=4, batch=2, prompt=21,
         block_size=16):
    policy = dataclasses.replace(
        policy_for_mode(mode, ber=ber, seed=42), scrub=scrub
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, prompt)))
    state, bt, _ = init_generation_state(
        cfg, policy, batch, prompt + steps + 2, block_size=block_size
    )
    key = jax.random.key(7)
    logits, state = prefill(params, ids, state, bt, cfg, policy, key)
    outs = [np.asarray(logits)]
    for s in range(steps):
        tok = jnp.argmax(logits, axis=-1)
        logits, state = decode_step(
            params, tok, state, bt, cfg, policy,
            jax.random.fold_in(key, s), block_size=block_size,
        )
        outs.append(np.asarray(logits))
    return outs, state


@pytest.fixture(scope="module")
def tiny():
    cfg = dataclasses.replace(TINY_LLAMA, name="scrub-tiny")
    return init_params(cfg, 0), cfg


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("ber", [0.0, 1e-2, 8e-2])
def test_scrub_is_bit_identical(tiny, mode, ber):
    """Scrubbed decode == decode-every-read, bitwise, including BERs high
    enough to produce uncorrectable codewords (golay zero-codeword scrub)."""
    params, cfg = tiny
    ref, _ = _run(params, cfg, mode, ber, scrub=False)
    got, _ = _run(params, cfg, mode, ber, scrub=True)
    assert len(ref) == len(got)
    for step, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {step}")


def test_scrub_cleans_cache(tiny):
    """With write-path scrubbing, EVERY stored codeword in the written
    context is a valid codeword (corrections applied before storage), so
    reads can extract data bits without a correction network. Covers the
    split layout's DEFERRED parity scatter: decode-step tokens' parity
    columns land via the end-of-step batched jnp update (models/runtime.py)
    and must recombine with the kernel-written data into valid codewords."""
    from qkv_ecc_tpu.codecs.algebra import GOLAY_B_ROW_MASKS
    from qkv_ecc_tpu.kernels import swar
    from qkv_ecc_tpu.kernels.common import golay_decode_i32

    params, cfg = tiny
    _, state = _run(params, cfg, "int12-golay", 1e-2, scrub=True, steps=2)
    bm = tuple(int(m) for m in GOLAY_B_ROW_MASKS)
    # rebuild full rows from the split data + parity arrays
    kc = np.asarray(
        swar.join_rows("golay", state["k_cache"], state["k_parity"], axis=3)
    )  # [L, blocks, H, W, bs]
    bs = kc.shape[-1]
    # sequence 0 owns blocks [0, pages); ALL its written tokens are clean
    n_ok = int(np.asarray(state["context_len"])[0])
    cw = swar.unpack_codewords(
        "golay", jnp.asarray(kc[:, : (n_ok - 1) // bs + 1]), cfg.head_dim,
        axis=3,
    )
    _, cnt = golay_decode_i32(cw, bm, zero_uncorrectable=True)
    cnt = np.asarray(cnt)  # [L, pages, H, C4, bs]
    toks = np.arange(cnt.shape[1] * bs).reshape(cnt.shape[1], bs)
    mask = (toks < n_ok)[None, :, None, None, :]  # over L, H, C4
    assert (np.where(mask, cnt, 0) == 0).all(), "written page has errors"


@pytest.mark.parametrize(
    "mode,codec",
    [("int4-hamming84", "hamming84"), ("int12-golay", "golay"),
     ("int4-hamming", "hamming74")],
)
def test_decode_loop_parity_written_valid(tiny, mode, codec):
    """The scanned decode_loop must store VALID codewords for loop-written
    tokens too: the split layout writes data through the kernel but parity
    through the per-step jnp scatter, and only decode_step (the host-loop
    path) was covered by test_scrub_cleans_cache - a silently skipped
    in-scan parity write would corrupt future correcting reads while
    leaving every extract-path test green."""
    from qkv_ecc_tpu.kernels import swar
    from qkv_ecc_tpu.models.runtime import decode_loop

    params, cfg = tiny
    policy = policy_for_mode(mode, ber=2e-2, seed=42)
    rng = np.random.default_rng(0)
    B, P, S = 2, 21, 6
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, P)))
    state, bt, _ = init_generation_state(
        cfg, policy, B, P + S + 2, block_size=16
    )
    key = jax.random.key(7)
    logits, state = prefill(params, ids, state, bt, cfg, policy, key)
    logits, state, _ = decode_loop(
        params, logits, state, bt, cfg, policy, key, S, block_size=16
    )
    for name in ("k", "v"):
        full = swar.join_rows(
            codec, state[f"{name}_cache"], state[f"{name}_parity"], axis=3
        )
        cw = swar.unpack_codewords(codec, full, cfg.head_dim, axis=3)
        scrubbed = swar.scrub_codewords(codec, cw)
        n_ok = int(state["context_len"][0])
        bs = 16
        pages = (n_ok - 1) // bs + 1
        valid = jnp.arange(pages * bs).reshape(pages, bs) < n_ok
        diff = (cw != scrubbed)[:, :pages]
        assert not bool(jnp.any(diff & valid[None, :, None, None, :])), name


@pytest.mark.parametrize("codec", ["hamming74", "hamming84", "golay"])
def test_readonly_kernel_scrub_extract_matches_decode(codec):
    """paged_attention_ecc(scrub=True) (extract-only fast path) is bitwise
    equal to the full-decode path on a cache of VALID codewords (the
    post-scrub invariant)."""
    from qkv_ecc_tpu.benchmarks.harness import build_decode_attention_case
    from qkv_ecc_tpu.kernels import swar
    from qkv_ecc_tpu.kernels.paged_attention import paged_attention_ecc

    q, cache, bt, ctx, cfg = build_decode_attention_case(
        batch=2, num_q_heads=4, num_kv_heads=2, head_dim=32,
        context_len=48, block_size=16, codec=codec, seed=5,
    )

    def scrubbed(packed, parity):
        full = swar.join_rows(codec, packed, parity, axis=3)
        cw = swar.unpack_codewords(codec, full, cfg.head_dim, axis=3)
        out = swar.pack_codewords(
            codec, swar.scrub_codewords(codec, cw), cfg.head_dim, axis=3
        ).astype(packed.dtype)
        return swar.split_rows(codec, out, cfg.head_dim, axis=3)

    kc, kp = scrubbed(cache["k_cache"], cache["k_parity"])
    vc, vp = scrubbed(cache["v_cache"], cache["v_parity"])

    def attn(scrub):
        return np.asarray(
            paged_attention_ecc(
                q, kc, vc, cache["k_scales"], cache["v_scales"], bt, ctx, 0,
                kp, vp, codec=codec, block_size=16, scrub=scrub,
            )
        )

    np.testing.assert_array_equal(attn(True), attn(False))


def test_scrub_serving_outputs_match(tiny):
    """Serving with scrub (stats off) produces the same tokens as the
    always-decode server."""
    from qkv_ecc_tpu.serving.scheduler import ContinuousBatchingServer, Request

    params, cfg = tiny
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, (n,)) for n in (5, 11, 17)]

    def serve(scrub):
        policy = dataclasses.replace(
            policy_for_mode("int12-golay", ber=1e-2, seed=42), scrub=scrub
        )
        srv = ContinuousBatchingServer(
            params, cfg, policy, max_batch=2, max_seq_len=64,
            block_size=16, num_blocks=12, collect_ecc_stats=False,
        )
        for i, p in enumerate(prompts):
            srv.add_request(Request(i, p, max_new_tokens=5))
        outs = srv.run()
        return {o.request_id: o.token_ids for o in outs}

    assert serve(True) == serve(False)
