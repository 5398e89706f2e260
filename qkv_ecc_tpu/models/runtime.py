"""Generation runtime: jitted prefill + decode steps over a functional paged
ECC cache.

The whole decode step - every layer's projections, quantize+encode+inject,
the fused write+attend Pallas kernel (in-place aliased cache update + paged
attention with inline ECC decode), MLP, and LM head - is ONE jitted function
with donated cache buffers. Prefill writes whole pages with an XLA scatter
(it runs once per sequence and never races the kernel's aliased updates).
Contrast with the reference, whose generate() re-prefilled the full prefix
each step through Python loops (its ECCDummyCache never advanced
`_seen_tokens`, kv_cache/ecc_shim.py:83-131, so HF generate re-sent the whole
sequence every step).

Block allocation here is static-sequential (sequence b owns pages
[b*P, (b+1)*P)); dynamic vLLM-style allocation for serving lives in
cache/block_manager.py + cache/engine.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.layout import ECCCacheConfig, allocate_ecc_kv_cache
from ..kernels import swar
from ..kernels.paged_attention import (
    paged_attention_ecc,
    paged_attention_ecc_write_attend,
)
from .config import ModelConfig
from .kv_policy import (
    KVCachePolicy,
    decode_kv,
    encode_kv,
    encode_pack_kv_scrubbed,
    hoisted_write_deltas,
    pack_kv,
)
from .layers import apply_rope, causal_attention, layer_norm, rms_norm, rope_frequencies

FUSED_CODECS = ("int4", "hamming74", "hamming84", "golay", "fp16", "fp8")


def _use_scrub(policy: KVCachePolicy) -> bool:
    """Write-path ECC scrubbing applies when corrections are deterministic
    per stored codeword: persistent (write-time) fault injection, no
    interpolation (it needs the per-read doubles mask). Decoded values are
    bit-identical either way (tests/test_scrub.py). int4 rides the same
    path (scrubbing an uncoded nibble is a no-op, and the kernel's extract
    branch is the faster loop shape - paged_attention.py _resolve_parity);
    the read-inject int4 arm cannot (fresh raw-bit flips per attend need
    the general decode path)."""
    return (
        policy.scrub
        and policy.codec in ("int4", "hamming74", "hamming84", "golay")
        and not policy.use_interpolation
        and policy.inject_at == "write"
    )


def init_generation_state(
    cfg: ModelConfig,
    policy: KVCachePolicy,
    batch: int,
    max_tokens: int,
    block_size: int = 128,
):
    """Allocate the paged cache + static sequential block table."""
    pages_per_seq = -(-max_tokens // block_size)
    cache_cfg = ECCCacheConfig(
        num_blocks=batch * pages_per_seq,
        block_size=block_size,
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        codec=policy.codec,
        max_seqs=batch,
    )
    state = allocate_ecc_kv_cache(cache_cfg)
    state["context_len"] = jnp.zeros((batch,), jnp.int32)
    block_table = np.arange(batch * pages_per_seq, dtype=np.int32).reshape(
        batch, pages_per_seq
    )
    return state, jnp.asarray(block_table), cache_cfg


def _layer_kv_key(policy: KVCachePolicy, layer_idx: int, step_key):
    base = jax.random.fold_in(step_key, layer_idx)
    return jax.random.fold_in(base, 0), jax.random.fold_in(base, 1)


def _stacked_layer_kv_keys(num_layers: int, step_key):
    """All layers' (k_key, v_key) as one [L, 2] typed-key array, built with
    the same fold_in chain as _layer_kv_key (vmapped fold_in is
    bit-identical to the scalar calls - threefry is pure arithmetic)."""
    bases = jax.vmap(lambda i: jax.random.fold_in(step_key, i))(
        jnp.arange(num_layers, dtype=jnp.uint32)
    )
    kks = jax.vmap(lambda b: jax.random.fold_in(b, 0))(bases)
    vks = jax.vmap(lambda b: jax.random.fold_in(b, 1))(bases)
    return jnp.stack([kks, vks], axis=1)


def _write_tokens(state, layer_idx, block_table, positions, kc, vc, ks, vs):
    """Scatter S encoded+PACKED tokens of every sequence into the paged
    cache (token-minor layout: cache[layer, block, head, word, slot]).

    kc/vc: [B, S, H, W] FULL packed storage rows (kernels/swar.py) or raw
    values for fp16/fp8 - split at the data/parity boundary here (the
    round-5 split cache layout); ks/vs: [B, S, H] or None; positions:
    [B, S].
    """
    bs = state["k_cache"].shape[4]
    dw = state["k_cache"].shape[3]
    phys = jnp.take_along_axis(block_table, positions // bs, axis=1)  # [B, S]
    slots = positions % bs
    # scatter: cache[layer, phys[b,s], h, :, slot[b,s]] = cw[b, s, h, :]
    kc = kc.astype(state["k_cache"].dtype)
    vc = vc.astype(state["v_cache"].dtype)
    state["k_cache"] = state["k_cache"].at[
        layer_idx, phys, :, :, slots].set(kc[..., :dw])
    state["v_cache"] = state["v_cache"].at[
        layer_idx, phys, :, :, slots].set(vc[..., :dw])
    if "k_parity" in state:
        state["k_parity"] = state["k_parity"].at[
            layer_idx, phys, :, :, slots].set(kc[..., dw:])
        state["v_parity"] = state["v_parity"].at[
            layer_idx, phys, :, :, slots].set(vc[..., dw:])
    if ks is not None:
        state["k_scales"] = state["k_scales"].at[layer_idx, phys, :, slots].set(ks)
        state["v_scales"] = state["v_scales"].at[layer_idx, phys, :, slots].set(vs)
    return state


def _proj_qkv(x, lp, cfg: ModelConfig, positions, inv_freq):
    B, S, E = x.shape
    H, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if cfg.arch == "gpt2":
        h = layer_norm(x, lp["ln_1"]["g"], lp["ln_1"]["b"], cfg.layer_norm_eps)
        qkv = h @ lp["c_attn"]["w"] + lp["c_attn"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, Hkv, D)
        v = v.reshape(B, S, Hkv, D)
    else:
        h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps)
        q = (h @ lp["q_proj"]).reshape(B, S, H, D)
        k = (h @ lp["k_proj"]).reshape(B, S, Hkv, D)
        v = (h @ lp["v_proj"]).reshape(B, S, Hkv, D)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
    return q, k, v


def _attn_out_mlp(x, attn, lp, cfg: ModelConfig):
    B, S = x.shape[:2]
    attn = attn.reshape(B, S, cfg.num_heads * cfg.head_dim)
    if cfg.arch == "gpt2":
        x = x + attn @ lp["c_proj"]["w"] + lp["c_proj"]["b"]
        h = layer_norm(x, lp["ln_2"]["g"], lp["ln_2"]["b"], cfg.layer_norm_eps)
        h = jax.nn.gelu(h @ lp["c_fc"]["w"] + lp["c_fc"]["b"], approximate=True)
        return x + h @ lp["mlp_proj"]["w"] + lp["mlp_proj"]["b"]
    x = x + attn @ lp["o_proj"]
    h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps)
    h = jax.nn.silu(h @ lp["gate_proj"]) * (h @ lp["up_proj"])
    return x + h @ lp["down_proj"]


def _embed(params, input_ids, cfg: ModelConfig, positions):
    if cfg.arch == "gpt2":
        return params["wte"][input_ids] + params["wpe"][positions]
    return params["embed"][input_ids].astype(jnp.dtype(cfg.dtype))


def _lm_head(params, x, cfg: ModelConfig):
    if cfg.arch == "gpt2":
        x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"], cfg.layer_norm_eps)
        return x @ params["wte"].T
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    return (x @ head.astype(x.dtype)).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("cfg", "policy"), donate_argnums=(2,)
)
def prefill(params, input_ids, state, block_table, cfg: ModelConfig,
            policy: KVCachePolicy, step_key, logit_pos=None,
            true_len=None):
    """Process the prompt: write the ECC cache and return last-token logits.

    input_ids: [B, S]. Attention uses the encode->decode roundtrip (identical
    values to what was just written).

    Bucketed prompts (serving): pass `logit_pos` [B] (the TRUE last prompt
    position; logits are gathered there instead of at S-1) and `true_len`
    [B] (stored as context_len so the padding tail is overwritten by decode
    before it can ever be attended - causal masking keeps real tokens from
    seeing the pad K/V during prefill).
    """
    B, S = input_ids.shape
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling_llama3)
    x = _embed(params, input_ids, cfg, positions)
    read = policy.inject_at == "read" and policy.inject_errors and policy.ber > 0
    use_scrub = _use_scrub(policy)
    for i, lp in enumerate(params["layers"]):
        q, k, v = _proj_qkv(x, lp, cfg, positions, inv_freq)
        kk, vk = _layer_kv_key(policy, i, step_key)
        kc, ks, _ = encode_kv(k, policy, kk)
        vc, vs, _ = encode_kv(v, policy, vk)
        kcs = swar.scrub_codewords(policy.codec, kc) if use_scrub else kc
        vcs = swar.scrub_codewords(policy.codec, vc) if use_scrub else vc
        state = _write_tokens(
            state, i, block_table, positions,
            pack_kv(kcs, policy, cfg.head_dim),
            pack_kv(vcs, policy, cfg.head_dim),
            ks, vs,
        )
        if read:  # unprotected arm: fresh flips on the nibbles read back
            krk = jax.random.fold_in(kk, 0x52454144)
            vrk = jax.random.fold_in(vk, 0x52454144)
            k_dec, _, _, _ = decode_kv(
                kc, ks, policy, head_dim=cfg.head_dim, seq_axis=1, read_key=krk
            )
            v_dec, _, _, _ = decode_kv(
                vc, vs, policy, head_dim=cfg.head_dim, seq_axis=1, read_key=vrk
            )
        else:
            k_dec, _, _ = decode_kv(kc, ks, policy, head_dim=cfg.head_dim, seq_axis=1)
            v_dec, _, _ = decode_kv(vc, vs, policy, head_dim=cfg.head_dim, seq_axis=1)
        attn = causal_attention(
            q, k_dec.astype(x.dtype), v_dec.astype(x.dtype), cfg.num_kv_groups,
            sliding_window=cfg.sliding_window,
        )
        x = _attn_out_mlp(x, attn, lp, cfg)
    if logit_pos is None:
        x_last = x[:, -1:, :]
    else:
        x_last = jnp.take_along_axis(x, logit_pos[:, None, None], axis=1)
    logits = _lm_head(params, x_last, cfg)[:, 0]
    state["context_len"] = (
        jnp.full((B,), S, jnp.int32) if true_len is None
        else jnp.asarray(true_len, jnp.int32)
    )
    return logits, state


def _write_inject(policy) -> bool:
    return (
        policy.inject_errors and policy.ber > 0 and policy.inject_at == "write"
    )


def _write_mask_shape(policy, batch, cfg):
    """Logical injection-mask shape for one decode token's (K or V) write:
    the d12 codeword array for golay, padded nibbles otherwise."""
    if policy.codec == "golay":
        return (batch, 1, cfg.num_kv_heads,
                swar.padded_values("golay", cfg.head_dim) // 3)
    return (batch, 1, cfg.num_kv_heads,
            swar.padded_values(policy.codec, cfg.head_dim))


def _folded_hoist_applies(policy, collect_ecc_stats):
    """True when the decode step consumes hoisted FOLDED write deltas
    (scrub_fold_mask of the per-layer masks; kv_policy.hoisted_write_
    deltas) - the scrubbed write path of every ECC codec."""
    return (
        _use_scrub(policy)
        and not collect_ecc_stats
        and _write_inject(policy)
    )


def _logical_hoist_applies(policy, collect_ecc_stats):
    """True when the decode step consumes hoisted RAW logical-codeword
    masks (uint8 slices of one bulk draw, XOR'd inside encode_kv): the
    UNscrubbed write-inject paths whose masks fit 8 bits - int4 always,
    hamming74/84 when scrub is off (always-decode / stats collection).
    Golay's 24-bit masks stay per-layer there (the always-decode arm is
    the reference-semantics path, not the perf path)."""
    return (
        not collect_ecc_stats
        and not _folded_hoist_applies(policy, collect_ecc_stats)
        and policy.codec in ("int4", "hamming74", "hamming84")
        and _write_inject(policy)
    )


def _decode_step_impl(params, token_ids, state, block_table, cfg: ModelConfig,
                      policy: KVCachePolicy, step_key, block_size: int = 128,
                      collect_ecc_stats: bool = False, hoisted_masks=None):
    """One incremental decode step: token_ids [B] -> logits [B, V].

    Writes the new token's K/V through the codec into the paged cache, then
    attends with the fused Pallas kernel (inline ECC decode).

    collect_ecc_stats=True accumulates the kernel's per-sequence
    corrected/detected counts (reference get_ecc_stats accounting,
    ecc_shim.py:1627) into state["ecc_corrected"]/state["ecc_detected"]
    ([B] int32; for the int4 read-inject arm slot 0 counts flipped read
    bits instead). Costs extra decode work for golay (the stats pass
    re-runs the counting decoder), so it is off in the perf benchmark.
    """
    B = token_ids.shape[0]
    pos = state["context_len"]  # [B]
    positions = pos[:, None]
    inv_freq = rope_frequencies(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling_llama3)
    x = _embed(params, token_ids[:, None], cfg, positions)
    # ECC patrol scrub (policy.scrub): correct dirty pages once in-kernel,
    # write corrected codewords back, extract-only on clean pages. Decoded
    # values are bit-identical to decode-every-read; disabled where
    # per-read semantics matter (stats counting, interpolation masks).
    use_scrub = _use_scrub(policy) and not collect_ecc_stats
    read = policy.inject_at == "read" and policy.inject_errors and policy.ber > 0
    ri_ber = float(policy.ber) if read else 0.0
    ri_seed = (
        jax.random.bits(
            jax.random.fold_in(step_key, 0x52454144), (), "uint32"
        ).astype(jnp.int32)
        if read
        else 0
    )
    # hoisted write deltas: draw EVERY layer's (K, V) injection mask in one
    # batched threefry chain at the step top and FOLD the scrub into it
    # (kv_policy.hoisted_write_deltas). Bit-identical streams to the
    # per-layer draws; avoids materializing 2L separate tiny mask chains
    # into downstream consumers (~30 us each = ~0.77 ms/step at bench
    # shapes) and moves ALL scrub-correction work (incl. golay's IMLD)
    # out of the per-layer chain.
    folded_hoist = _folded_hoist_applies(policy, collect_ecc_stats)
    logical_hoist = (
        hoisted_masks is not None
        and _logical_hoist_applies(policy, collect_ecc_stats)
    )
    if folded_hoist and hoisted_masks is None:
        # standalone decode_step (serving): hoist within the step
        kv_key = jax.random.fold_in(step_key, 1000000)
        hoisted_masks = hoisted_write_deltas(
            policy,
            _stacked_layer_kv_keys(len(params["layers"]), kv_key),
            _write_mask_shape(policy, B, cfg),
        )
    # Split cache layout (round 5): in scrub-extract mode the kernel sees
    # ONLY the data arrays (fully contiguous int4-shaped page DMAs); the
    # new token's parity columns are collected across layers and scattered
    # into the parity arrays in ONE batched jnp update per K/V at the end
    # of the step (per-layer scatters would pay ~48 fusion-launch taxes).
    # Parity is never read this step, so deferring the write is invisible.
    has_parity = "k_parity" in state
    extract = (
        use_scrub and has_parity
        and swar.scrub_extract_ok(policy.codec, cfg.head_dim)
    )
    stream_parity = has_parity and not extract
    dw = state["k_cache"].shape[3]
    k_par_cols, v_par_cols = [], []
    for i, lp in enumerate(params["layers"]):
        q, k, v = _proj_qkv(x, lp, cfg, positions, inv_freq)
        kk, vk = _layer_kv_key(policy, i, jax.random.fold_in(step_key, 1000000))
        if use_scrub:
            # scrub-folded write in ONE fused chain per tensor: quantize ->
            # xor delta -> encode+pack (golay packs rows straight from the
            # folded nibbles via the XOR-chain parity; kv_policy
            # .encode_pack_kv_scrubbed) - same chain shape as int4
            kc, ks = encode_pack_kv_scrubbed(
                k, policy, kk,
                folded=hoisted_masks[i, 0] if folded_hoist else None,
            )
            vc, vs = encode_pack_kv_scrubbed(
                v, policy, vk,
                folded=hoisted_masks[i, 1] if folded_hoist else None,
            )
        else:
            lk_mask = hoisted_masks[i, 0] if logical_hoist else None
            lv_mask = hoisted_masks[i, 1] if logical_hoist else None
            kc, ks, _ = encode_kv(k, policy, kk, mask=lk_mask)
            vc, vs, _ = encode_kv(v, policy, vk, mask=lv_mask)
            kc = pack_kv(kc, policy, cfg.head_dim)
            vc = pack_kv(vc, policy, cfg.head_dim)
        kc = kc[:, 0]  # [B, Hkv, W] full rows
        vc = vc[:, 0]
        if ks is None:  # float codecs carry no dequant scales
            ks = vs = jnp.ones((B, 1) + kc.shape[1:2], jnp.float32)
        if extract:
            # kernel consumes the data prefix only; parity columns deferred
            k_par_cols.append(kc[..., dw:])
            v_par_cols.append(vc[..., dw:])
            kc, vc = kc[..., :dw], vc[..., :dw]
            parity_args = ()
        elif stream_parity:
            parity_args = (state["k_parity"], state["v_parity"])
        else:
            parity_args = ()
        # fused write+attend: the new token's codeword column is inserted
        # into its page inside the kernel and the caches are updated
        # in-place (input/output aliasing) - XLA never copies them.
        outs = paged_attention_ecc_write_attend(
            q[:, 0],  # [B, Hq, D]
            kc,
            vc,
            ks[:, 0],  # [B, Hkv]
            vs[:, 0],
            state["k_cache"],
            state["v_cache"],
            state["k_scales"],
            state["v_scales"],
            block_table,
            pos + 1,
            i,
            *parity_args,
            scrub=use_scrub,
            codec=policy.codec,
            block_size=block_size,
            use_interpolation=policy.use_interpolation,
            read_inject_ber=ri_ber,
            read_inject_seed=ri_seed,
            sliding_window=cfg.sliding_window,
            collect_stats=collect_ecc_stats,
        )
        attn = outs[0]
        state["k_cache"], state["v_cache"] = outs[1], outs[2]
        if stream_parity:
            state["k_parity"], state["v_parity"] = outs[3], outs[4]
            state["k_scales"], state["v_scales"] = outs[5], outs[6]
            nxt = 7
        else:
            state["k_scales"], state["v_scales"] = outs[3], outs[4]
            nxt = 5
        if collect_ecc_stats:
            kstats = outs[nxt]  # [B, 2] int32
            state["ecc_corrected"] = (
                state.get("ecc_corrected", jnp.zeros((B,), jnp.int32))
                + kstats[:, 0]
            )
            state["ecc_detected"] = (
                state.get("ecc_detected", jnp.zeros((B,), jnp.int32))
                + kstats[:, 1]
            )
        x = _attn_out_mlp(x, attn[:, None], lp, cfg)
    if k_par_cols:
        # one batched parity scatter per K/V covering all layers' columns:
        # parity[l, phys[b], h, :, slot[b]] = col[b, l, h, :]. Issued as a
        # raw lax.scatter with unique_indices + PROMISE_IN_BOUNDS: the
        # .at[:, phys, :, :, slots] form (unique_indices=False + index
        # clamping) blocks XLA's in-place scatter on the donated scan
        # carry, which double-buffers BOTH parity arrays every step - a
        # context-scaling multi-GB TEMP allocation (measured 9.5 GB at ctx
        # 8k for golay; OOMs two 8k arms) and ~0.5-0.8 ms/step of copy
        # traffic at ctx 1024. Indices ARE unique (one (page, slot) per
        # batch row, disjoint per-sequence block tables) and in bounds
        # (straight from block_table).
        bs = state["k_cache"].shape[4]
        phys = jnp.take_along_axis(
            block_table, (pos // bs)[:, None], axis=1
        )[:, 0]
        slots = pos % bs
        kp = jnp.moveaxis(jnp.stack(k_par_cols), 0, 1)  # [B, L, H, pw]
        vp = jnp.moveaxis(jnp.stack(v_par_cols), 0, 1)
        idx = jnp.stack([phys, slots], axis=1)  # [B, 2]
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(1, 4),
            scatter_dims_to_operand_dims=(1, 4),
        )
        # NOTE on forms (all measured on-chip, round 5 continuation):
        # this batched scatter keeps L/H/pw as update-window dims, which
        # makes XLA re-layout the parity carry inside the while loop
        # ({0,2,4,3,1}: L-minor) - the transposed entry/exit copies are
        # amortized over the whole 64-step loop (~0.01 ms/step) but the
        # duplicate transposed buffers are a context-scaling TEMP
        # allocation (golay ctx-8k decode: 10 GB temp, so two 8k arms do
        # not fit on one 16 GB chip). The "obvious" fix - folding L into
        # the scatter indices over a [L*P, H, pw, bs] view so the carry
        # keeps its native layout - moves the layout copies INSIDE the
        # loop: golay decode measured 16.9 ms/step vs 5.2 (full parity
        # copy-in/copy-out every step). Keep this form; for >4k contexts
        # run protected arms one-at-a-time per process.
        scat = functools.partial(
            jax.lax.scatter,
            dimension_numbers=dnums,
            indices_are_sorted=False,
            unique_indices=True,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        state["k_parity"] = scat(
            state["k_parity"], idx, kp.astype(state["k_parity"].dtype)
        )
        state["v_parity"] = scat(
            state["v_parity"], idx, vp.astype(state["v_parity"].dtype)
        )
    logits = _lm_head(params, x, cfg)[:, 0]
    state["context_len"] = pos + 1
    return logits, state


decode_step = functools.partial(
    jax.jit,
    static_argnames=("cfg", "policy", "block_size", "collect_ecc_stats"),
    donate_argnums=(2,),
)(_decode_step_impl)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "policy", "num_steps", "block_size",
                     "collect_ecc_stats"),
    donate_argnums=(2,),
)
def decode_loop(params, logits, state, block_table, cfg: ModelConfig,
                policy: KVCachePolicy, base_key, num_steps: int,
                block_size: int = 128, collect_ecc_stats: bool = False):
    """`num_steps` greedy decode steps in ONE jitted lax.scan.

    Equivalent to the host loop

        for step in range(num_steps):
            logits, state = decode_step(params, argmax(logits), state, ...,
                                        fold_in(base_key, step))

    but with zero host round-trips: token selection (argmax), the cache
    writes, and every layer's fused write+attend kernel run on-device
    under one dispatch. This is both the production decode-loop shape and
    the only timing-faithful shape through the tunneled chip, whose
    per-dispatch overhead is 1-3 ms with huge session-dependent variance
    (CLAUDE.md). The paged caches flow through the scan carry donated, so
    the in-kernel aliased updates stay in-place (verified: step time
    matches the host loop's healthy-tunnel floor, no XLA cache copies).

    Returns (logits [B, V] after the last step, state, tokens
    [num_steps, B] - the argmax token fed into each step).
    """
    B = logits.shape[0]
    if collect_ecc_stats:
        state.setdefault("ecc_corrected", jnp.zeros((B,), jnp.int32))
        state.setdefault("ecc_detected", jnp.zeros((B,), jnp.int32))

    # Write-inject modes: pre-draw EVERY step's (layer, K/V) injection masks
    # in ONE vmapped threefry chain before the scan. Bit-identical to the
    # per-step draws (vmapped fold_in/threefry == the scalar calls), but the
    # ~0.17 ms/step of serial mask arithmetic at the head of each step
    # becomes one bulk draw amortized across the whole dispatch; the scan
    # body takes a free dynamic slice. Scrubbed codecs get FOLDED deltas
    # (scrub correction pre-applied to the mask - incl. golay's IMLD, which
    # thereby leaves the per-layer chain entirely; swar.scrub_fold_mask);
    # unscrubbed int4/hamming get raw uint8 logical-codeword masks XOR'd
    # inside encode_kv. Applied to the BASELINE (int4-write-inject) too, so
    # protected-vs-unprotected ratios compare equal injection machinery.
    # Memory bound: the hoisted buffer grows linearly with num_steps -
    # uint8/uint16 [steps, L, 2, B, 1, Hkv, <=pv], ~35-50 MB at bench
    # shapes (128 steps x 24 layers). Callers scanning thousands of steps
    # should chunk decode_loop into a few hundred steps per call (the
    # bench/serving shapes never exceed 128).
    all_tiles = None
    L = len(params["layers"])
    if _folded_hoist_applies(policy, collect_ecc_stats):
        shape = _write_mask_shape(policy, B, cfg)

        def step_deltas(step):
            kv_key = jax.random.fold_in(
                jax.random.fold_in(base_key, step), 1000000
            )
            return hoisted_write_deltas(
                policy, _stacked_layer_kv_keys(L, kv_key), shape
            )

        all_tiles = jax.vmap(step_deltas)(jnp.arange(num_steps))
    elif _logical_hoist_applies(policy, collect_ecc_stats):
        from ..codecs.fault_injection import flip_mask_for
        from .kv_policy import N_BITS

        enc_shape = (
            B, 1, cfg.num_kv_heads,
            swar.padded_values(policy.codec, cfg.head_dim),
        )
        n_bits = N_BITS[policy.codec]

        def step_masks(step):
            kv_key = jax.random.fold_in(
                jax.random.fold_in(base_key, step), 1000000
            )
            keys = _stacked_layer_kv_keys(L, kv_key).reshape(2 * L)
            m = jax.vmap(
                lambda kk: flip_mask_for(kk, enc_shape, policy.ber, n_bits)
            )(keys)
            # masks are <= 8 bits/element for these codecs: store uint8
            return m.reshape((L, 2) + enc_shape).astype(jnp.uint8)

        all_tiles = jax.vmap(step_masks)(jnp.arange(num_steps))

    def body(carry, step):
        logits, state = carry
        tok = jnp.argmax(logits, axis=-1)
        logits, state = _decode_step_impl(
            params, tok, state, block_table, cfg, policy,
            jax.random.fold_in(base_key, step), block_size=block_size,
            collect_ecc_stats=collect_ecc_stats,
            hoisted_masks=None if all_tiles is None else all_tiles[step],
        )
        return (logits, state), tok

    (logits, state), tokens = jax.lax.scan(
        body, (logits, state), jnp.arange(num_steps)
    )
    return logits, state, tokens


def generate(
    params,
    input_ids,
    cfg: ModelConfig,
    policy: KVCachePolicy,
    max_new_tokens: int = 32,
    block_size: int = 128,
    temperature: float = 0.0,
    seed: int = 0,
    return_ecc_stats: bool = False,
):
    """Greedy (temperature=0) or sampled generation.

    input_ids: [B, S] numpy/jnp int array. Returns [B, S + max_new_tokens],
    or (tokens, {"errors_corrected": [B], "errors_detected": [B]}) with
    return_ecc_stats (decode-phase counts from the fused kernel; the
    reference's get_ecc_stats, ecc_shim.py:1627).
    """
    if policy.codec not in FUSED_CODECS:
        raise NotImplementedError(
            f"jitted generation supports {FUSED_CODECS}; use cache.engine for "
            f"'{policy.codec}'"
        )
    input_ids = jnp.asarray(input_ids)
    B, S = input_ids.shape
    max_tokens = S + max_new_tokens
    state, block_table, _ = init_generation_state(
        cfg, policy, B, max_tokens, block_size
    )
    key = jax.random.key(policy.seed)
    logits, state = prefill(
        params, input_ids, state, block_table, cfg, policy, key
    )
    tokens = [input_ids]
    sample_key = jax.random.key(seed)
    for step in range(max_new_tokens):
        if temperature > 0:
            sample_key, sub = jax.random.split(sample_key)
            next_tok = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            next_tok = jnp.argmax(logits, axis=-1)
        tokens.append(next_tok[:, None])
        if step == max_new_tokens - 1:
            break
        logits, state = decode_step(
            params,
            next_tok,
            state,
            block_table,
            cfg,
            policy,
            jax.random.fold_in(key, S + step),
            block_size=block_size,
            collect_ecc_stats=return_ecc_stats,
        )
    out = jnp.concatenate(tokens, axis=1)
    if return_ecc_stats:
        zeros = jnp.zeros((B,), jnp.int32)
        return out, {
            "errors_corrected": state.get("ecc_corrected", zeros),
            "errors_detected": state.get("ecc_detected", zeros),
        }
    return out
