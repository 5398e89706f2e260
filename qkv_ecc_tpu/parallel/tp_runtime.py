"""Tensor-parallel generation runtime: shard_map'ed prefill/decode over a
(data, model) mesh with the ECC paged cache sharded on its kv-head axis.

New TPU-native infrastructure (the reference is strictly single-GPU,
SURVEY.md §2.9). Execution model per layer (Megatron TP):

    x (replicated over model, batch-sharded over data)
      -> column-sharded q/k/v projections  (local heads, NO collective)
      -> RoPE + ECC encode -> local paged-cache write (kv-heads local)
      -> fused Pallas paged attention on the LOCAL cache shard
         (the ECC decode bit-twiddling never crosses ICI)
      -> row-sharded o_proj -> psum over "model"
      -> column-sharded gate/up -> row-sharded down -> psum over "model"

So exactly two psums per layer ride the ICI, overlapped by XLA with the
next layer's local compute; the fused dequant+ECC-decode+attention kernel is
purely local. The LM head is vocab-sharded with a final all-gather.

Supports the llama family (the multi-chip targets: Mistral-7B,
LLaMA-3.1-8B) AND GPT-2: its packed c_attn is column-permuted
head-blockwise at shard time (sharding.permute_gpt2_qkv) so attention is
fully tensor-parallel despite the fused Q|K|V weight layout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cache.layout import ECCCacheConfig, allocate_ecc_kv_cache
from ..codecs.fault_injection import flip_mask_for
from ..kernels import swar
from ..kernels.paged_attention import paged_attention_ecc_write_attend
from ..models.config import ModelConfig
from ..models.kv_policy import (
    N_BITS,
    KVCachePolicy,
    decode_kv,
    encode_kv,
    encode_pack_kv_scrubbed,
    hoisted_write_deltas,
    pack_kv,
)
from ..models.layers import (
    apply_rope,
    causal_attention,
    layer_norm,
    rms_norm,
    rope_frequencies,
)
from ..models.runtime import _stacked_layer_kv_keys
from ..models.runtime import _use_scrub as use_scrub
from ..models.runtime import _write_tokens
from .sharding import cache_specs, param_specs


def _local_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, (
        f"heads {cfg.num_heads}/{cfg.num_kv_heads} not divisible by tp={tp}"
    )
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
    )


def _layer_kv_key(policy, layer_idx, step_key):
    base = jax.random.fold_in(step_key, layer_idx)
    return jax.random.fold_in(base, 0), jax.random.fold_in(base, 1)


def _shard_masks(policy, kk, vk, B_local, S, kv_heads_full, kv_heads_local,
                 head_dim, data_shards):
    """Write-path injection masks for this shard: FULL-draw + slice.
    Every shard draws the SAME per-layer mask stream a single-chip run
    would (same keys, same full [B_global, S, Hkv_full, ...] shape - the
    threefry counters enumerate the whole array, so any shape change moves
    every bit) and keeps only its own (data-batch, kv-head) slice. The
    sharded cache state and the psum'd ECC counters are therefore
    BIT-IDENTICAL to the single-chip server's (tests/test_serving.py
    asserts this at BER>0). Shards stay statistically decorrelated because
    they own disjoint slices of one stream - no per-shard key folding
    needed. The full draw is recomputed on every shard; at decode shapes
    it is a few KB of threefry, fused into the consumer."""
    codec = policy.codec
    B_full = B_local * data_shards
    if codec == "golay":
        full = (B_full, S, kv_heads_full,
                swar.padded_values("golay", head_dim) // 3)
    elif codec == "fp8":
        full = (B_full, S, kv_heads_full, head_dim)
    else:
        full = (B_full, S, kv_heads_full, swar.padded_values(codec, head_dim))
    mshard = jax.lax.axis_index("model")
    dshard = jax.lax.axis_index("data")

    def draw(key):
        m = flip_mask_for(key, full, policy.ber, N_BITS[codec])
        m = jax.lax.dynamic_slice_in_dim(
            m, dshard * B_local, B_local, axis=0
        )
        return jax.lax.dynamic_slice_in_dim(
            m, mshard * kv_heads_local, kv_heads_local, axis=2
        )

    return draw(kk), draw(vk)


def _block_tp(x, lp, cfgl: ModelConfig, policy, layer_idx, positions, inv_freq,
              state, block_table, *, write: bool, fused_attend: bool,
              block_size: int, step_key, k_folded=None, v_folded=None,
              collect_stats=False, kv_heads_full=None, data_shards=1):
    """One transformer block on local shards; psums over 'model'.

    Returns (x, state, kstats, par_cols) - kstats is the fused kernel's
    LOCAL [B, 2] (corrected, detected) counts when collect_stats, else
    None (the caller sums layers and psums once over 'model'); par_cols is
    the new token's deferred (k, v) parity columns in scrub-extract mode
    (the caller batches all layers' columns into one scatter - the split
    cache layout, models/runtime.py), else None."""
    B, S, E = x.shape
    H, Hkv, D = cfgl.num_heads, cfgl.num_kv_heads, cfgl.head_dim
    if kv_heads_full is None:
        kv_heads_full = Hkv

    if cfgl.arch == "gpt2":
        # c_attn was column-permuted at shard time (sharding.py:
        # permute_gpt2_qkv) so this shard's slice is [Q_s | K_s | V_s] -
        # a plain local third-split recovers its heads' projections
        h = layer_norm(
            x, lp["ln_1"]["g"], lp["ln_1"]["b"], cfgl.layer_norm_eps
        )
        qkv = h @ lp["c_attn"]["w"] + lp["c_attn"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, Hkv, D)
        v = v.reshape(B, S, Hkv, D)
    else:
        h = rms_norm(x, lp["input_norm"], cfgl.rms_norm_eps)
        q = (h @ lp["q_proj"]).reshape(B, S, H, D)
        k = (h @ lp["k_proj"]).reshape(B, S, Hkv, D)
        v = (h @ lp["v_proj"]).reshape(B, S, Hkv, D)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

    kk, vk = _layer_kv_key(policy, layer_idx, step_key)
    inject = (
        policy.inject_errors and policy.ber > 0 and policy.inject_at == "write"
    )
    k_mask = v_mask = None
    if inject and policy.codec != "fp16" and k_folded is None:
        # full-draw + shard-slice streams (see _shard_masks): bit-identical
        # to the single-chip server's injection, shards decorrelated by
        # owning disjoint slices
        k_mask, v_mask = _shard_masks(
            policy, kk, vk, B, S, kv_heads_full, Hkv, D, data_shards
        )
    scrub_on = use_scrub(policy) and not collect_stats
    if fused_attend and scrub_on:
        # decode hot path: scrub-folded write in one fused chain
        # (quantize -> xor delta -> encode+pack;
        # kv_policy.encode_pack_kv_scrubbed). k_folded/v_folded carry the
        # hoisted pre-folded deltas when the caller drew them.
        kcp, ks = encode_pack_kv_scrubbed(
            k, policy, kk, mask=k_mask, folded=k_folded)
        vcp, vs = encode_pack_kv_scrubbed(
            v, policy, vk, mask=v_mask, folded=v_folded)
    else:
        kc, ks, _ = encode_kv(k, policy, kk, mask=k_mask)
        vc, vs, _ = encode_kv(v, policy, vk, mask=v_mask)
        if use_scrub(policy) and not fused_attend:
            # prefill scrubs through the jnp chain (runs once per sequence)
            kc = swar.scrub_codewords(policy.codec, kc)
            vc = swar.scrub_codewords(policy.codec, vc)
        kcp = pack_kv(kc, policy, D)
        vcp = pack_kv(vc, policy, D)
    if ks is None:  # float codecs (fp16/fp8) carry no dequant scales
        ks = vs = jnp.ones(kcp.shape[:3], jnp.float32)
    read = policy.inject_at == "read" and policy.inject_errors and policy.ber > 0

    kstats = None
    par_cols = None
    if fused_attend:
        ri_seed = (
            jax.random.bits(
                jax.random.fold_in(kk, 0x52454144), (), "uint32"
            ).astype(jnp.int32)
            if read
            else 0
        )
        # split cache layout: data-only kernel operands + deferred parity
        # scatter in scrub-extract mode; parity arrays stream through the
        # kernel on correcting reads (models/runtime.py)
        has_parity = "k_parity" in state
        extract = (
            scrub_on and has_parity
            and swar.scrub_extract_ok(policy.codec, D)
        )
        kn, vn = kcp[:, 0], vcp[:, 0]
        parity_args = ()
        if extract:
            dw = state["k_cache"].shape[3]
            par_cols = (kn[..., dw:], vn[..., dw:])
            kn, vn = kn[..., :dw], vn[..., :dw]
        elif has_parity:
            parity_args = (state["k_parity"], state["v_parity"])
        # fused write+attend: in-place aliased cache update, decode-phase
        # attention on the LOCAL kv-head shard (no collective)
        outs = paged_attention_ecc_write_attend(
            q[:, 0],
            kn,
            vn,
            ks[:, 0],
            vs[:, 0],
            state["k_cache"],
            state["v_cache"],
            state["k_scales"],
            state["v_scales"],
            block_table,
            state["context_len"] + 1,
            layer_idx,
            *parity_args,
            scrub=scrub_on,
            codec=policy.codec,
            block_size=block_size,
            use_interpolation=policy.use_interpolation,
            read_inject_ber=float(policy.ber) if read else 0.0,
            read_inject_seed=ri_seed,
            sliding_window=cfgl.sliding_window,
            collect_stats=collect_stats,
        )
        attn = outs[0]
        state["k_cache"], state["v_cache"] = outs[1], outs[2]
        if parity_args:
            state["k_parity"], state["v_parity"] = outs[3], outs[4]
            state["k_scales"], state["v_scales"] = outs[5], outs[6]
            nxt = 7
        else:
            state["k_scales"], state["v_scales"] = outs[3], outs[4]
            nxt = 5
        if collect_stats:
            kstats = outs[nxt]  # local [B, 2] int32
        attn = attn[:, None]
    else:
        if write:
            state = _write_tokens(
                state, layer_idx, block_table, positions, kcp, vcp, ks, vs
            )
        if read:
            # read-inject masks are drawn on the LOCAL shape, so the read
            # keys fold the shard index for cross-shard decorrelation (the
            # unprotected arm has no counter-parity requirement)
            shard = jax.lax.axis_index("model")
            k_dec, _, _, _ = decode_kv(
                kc, ks, policy, head_dim=D, seq_axis=1,
                read_key=jax.random.fold_in(
                    jax.random.fold_in(kk, 0x52454144), shard
                ),
            )
            v_dec, _, _, _ = decode_kv(
                vc, vs, policy, head_dim=D, seq_axis=1,
                read_key=jax.random.fold_in(
                    jax.random.fold_in(vk, 0x52454144), shard
                ),
            )
        else:
            k_dec, _, _ = decode_kv(kc, ks, policy, head_dim=D, seq_axis=1)
            v_dec, _, _ = decode_kv(vc, vs, policy, head_dim=D, seq_axis=1)
        attn = causal_attention(
            q, k_dec.astype(x.dtype), v_dec.astype(x.dtype), cfgl.num_kv_groups,
            sliding_window=cfgl.sliding_window,
        )

    attn = attn.reshape(B, S, H * D)
    if cfgl.arch == "gpt2":
        # row-sharded c_proj: psum partial products, add the (replicated)
        # bias once after the reduction
        x = x + jax.lax.psum(attn @ lp["c_proj"]["w"], "model") + lp["c_proj"]["b"]
        h = layer_norm(
            x, lp["ln_2"]["g"], lp["ln_2"]["b"], cfgl.layer_norm_eps
        )
        h = jax.nn.gelu(
            h @ lp["c_fc"]["w"] + lp["c_fc"]["b"], approximate=True
        )
        x = x + jax.lax.psum(h @ lp["mlp_proj"]["w"], "model") + lp["mlp_proj"]["b"]
        return x, state, kstats, par_cols
    # row-sharded o_proj: partial sums -> psum over the model axis
    attn_out = jax.lax.psum(attn @ lp["o_proj"], "model")
    x = x + attn_out

    h = rms_norm(x, lp["post_attn_norm"], cfgl.rms_norm_eps)
    h = jax.nn.silu(h @ lp["gate_proj"]) * (h @ lp["up_proj"])
    x = x + jax.lax.psum(h @ lp["down_proj"], "model")
    return x, state, kstats, par_cols


def _embed_tp(params, ids, positions, cfg: ModelConfig):
    if cfg.arch == "gpt2":
        return (params["wte"][ids] + params["wpe"][positions]).astype(
            jnp.dtype(cfg.dtype)
        )
    return params["embed"][ids].astype(jnp.dtype(cfg.dtype))


def _lm_head_tp(params, x, cfgl: ModelConfig):
    if cfgl.arch == "gpt2":
        x = layer_norm(
            x, params["ln_f"]["g"], params["ln_f"]["b"], cfgl.layer_norm_eps
        )
        return (x @ params["wte"].T.astype(x.dtype)).astype(jnp.float32)
    x = rms_norm(x, params["final_norm"], cfgl.rms_norm_eps)
    if cfgl.tie_word_embeddings:
        # embed replicated -> logits full on every shard
        return (x @ params["embed"].T.astype(x.dtype)).astype(jnp.float32)
    logits_local = (x @ params["lm_head"].astype(x.dtype)).astype(jnp.float32)
    return jax.lax.all_gather(logits_local, "model", axis=-1, tiled=True)


def make_tp_functions(cfg: ModelConfig, policy: KVCachePolicy, mesh: Mesh,
                      block_size: int = 128, collect_ecc_stats: bool = False):
    """Build (init_state, prefill, decode_step) closed over the mesh.

    All three are pjit-compiled with NamedShardings; prefill/decode run under
    shard_map with the two-psum-per-layer TP scheme.

    block_size defaults to 128: the fused write+attend kernel requires
    block_size % 128 == 0 on real TPUs (token-minor lane alignment) - smaller
    values only work in the CPU interpreter.

    collect_ecc_stats=True makes the decode step return per-sequence
    corrected/detected ECC counters in state["ecc_corrected"/"ecc_detected"]
    ([B] int32, data-sharded): each model shard counts its local kv-heads'
    errors in-kernel, the per-layer counts are summed locally and psum'd
    ONCE over "model" per step. With the full-draw + head-slice injection
    streams (_shard_masks) the totals are bit-identical to the single-chip
    server's (reference get_ecc_stats, ecc_shim.py:1627). Like the
    single-chip runtime, collecting disables write-path scrubbing (stats
    count corrections per READ).
    """
    if cfg.arch not in ("llama", "gpt2"):
        raise NotImplementedError(f"TP runtime does not support '{cfg.arch}'")
    tp = mesh.shape["model"]
    dp = mesh.shape["data"]
    cfgl = _local_cfg(cfg, tp)

    pspecs = param_specs(cfg)
    cspecs = cache_specs()
    data_spec = P("data")

    def init_state(batch: int, max_tokens: int):
        pages = -(-max_tokens // block_size)
        cache_cfg = ECCCacheConfig(
            num_blocks=batch * pages,
            block_size=block_size,
            num_layers=cfg.num_layers,
            num_kv_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
            codec=policy.codec,
            max_seqs=batch,
        )
        state = allocate_ecc_kv_cache(cache_cfg)
        state["context_len"] = jnp.zeros((batch,), jnp.int32)
        state = {
            k: jax.device_put(v, NamedSharding(mesh, cspecs[k]))
            for k, v in state.items()
        }
        bt = np.arange(batch * pages, dtype=np.int32).reshape(batch, pages)
        block_table = jax.device_put(jnp.asarray(bt), NamedSharding(mesh, P("data")))
        return state, block_table

    inv_freq_fn = lambda: rope_frequencies(
        cfg.head_dim, cfg.rope_theta, cfg.rope_scaling_llama3
    )

    cache_keys = ("k_cache", "v_cache", "k_scales", "v_scales")
    if swar.parity_words(policy.codec, cfg.head_dim) > 0:
        cache_keys += ("k_parity", "v_parity")
    local_cache_specs = {k: cspecs[k] for k in cache_keys}
    state_specs = {**local_cache_specs, "context_len": P("data")}

    def _prefill_shard(params, ids, state, block_table, key, logit_pos,
                       true_len):
        B, S = ids.shape
        positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        x = _embed_tp(params, ids, positions, cfg)
        inv_freq = inv_freq_fn()
        for i, lp in enumerate(params["layers"]):
            x, state, _, _ = _block_tp(
                x, lp, cfgl, policy, i, positions, inv_freq, state, block_table,
                write=True, fused_attend=False, block_size=block_size,
                step_key=key, kv_heads_full=cfg.num_kv_heads,
                data_shards=dp,
            )
        x_last = jnp.take_along_axis(x, logit_pos[:, None, None], axis=1)
        logits = _lm_head_tp(params, x_last, cfgl)[:, 0]
        state["context_len"] = true_len.astype(jnp.int32)
        return logits, state

    def _decode_shard(params, tokens, state, block_table, key):
        B = tokens.shape[0]
        pos = state["context_len"]
        positions = pos[:, None]
        x = _embed_tp(params, tokens[:, None], positions, cfg)
        inv_freq = inv_freq_fn()
        # the single-chip decode step's kv-key stream (models/runtime.py:
        # _decode_step_impl folds 1000000 before the per-layer fold) - kept
        # identical so the full-draw + head-slice masks reproduce the
        # single-chip injection bit-for-bit
        kv_base = jax.random.fold_in(key, 1000000)
        scrub_on = use_scrub(policy) and not collect_ecc_stats
        # hoisted write deltas: all layers' (K, V) injection masks drawn
        # and scrub-FOLDED in one batched threefry chain (see
        # models/runtime.py) over the FULL shapes, shard-sliced
        hoist = (
            scrub_on
            and policy.inject_errors
            and policy.ber > 0
            and policy.inject_at == "write"
        )
        deltas = None
        if hoist:
            mshard = jax.lax.axis_index("model")
            dshard = jax.lax.axis_index("data")
            lk = _stacked_layer_kv_keys(len(params["layers"]), kv_base)
            if policy.codec == "golay":
                full_shape = (
                    B * dp, 1, cfg.num_kv_heads,
                    swar.padded_values("golay", cfg.head_dim) // 3,
                )
            else:
                full_shape = (
                    B * dp, 1, cfg.num_kv_heads,
                    swar.padded_values(policy.codec, cfg.head_dim),
                )
            deltas = hoisted_write_deltas(policy, lk, full_shape)
            # slice this shard's (data-batch, kv-head) portion of the
            # full-shape stream (fold commutes with slicing - it is
            # elementwise per codeword)
            deltas = jax.lax.dynamic_slice_in_dim(
                deltas, dshard * B, B, axis=2
            )
            deltas = jax.lax.dynamic_slice_in_dim(
                deltas, mshard * cfgl.num_kv_heads, cfgl.num_kv_heads, axis=4
            )
        corr = det = None
        k_par_cols, v_par_cols = [], []
        for i, lp in enumerate(params["layers"]):
            x, state, kstats, par_cols = _block_tp(
                x, lp, cfgl, policy, i, positions, inv_freq, state, block_table,
                write=True, fused_attend=True, block_size=block_size,
                step_key=kv_base,
                k_folded=deltas[i, 0] if hoist else None,
                v_folded=deltas[i, 1] if hoist else None,
                collect_stats=collect_ecc_stats,
                kv_heads_full=cfg.num_kv_heads,
                data_shards=dp,
            )
            if par_cols is not None:
                k_par_cols.append(par_cols[0])
                v_par_cols.append(par_cols[1])
            if collect_ecc_stats:
                corr = kstats[:, 0] if corr is None else corr + kstats[:, 0]
                det = kstats[:, 1] if det is None else det + kstats[:, 1]
        if k_par_cols:
            # scrub-extract split layout: one batched parity scatter per
            # K/V covering all layers' new-token columns (models/runtime.py)
            bs = state["k_cache"].shape[4]
            phys = jnp.take_along_axis(
                block_table, (pos // bs)[:, None], axis=1
            )[:, 0]
            slots = pos % bs
            kp = jnp.moveaxis(jnp.stack(k_par_cols), 0, 1)  # [B, L, H, pw]
            vp = jnp.moveaxis(jnp.stack(v_par_cols), 0, 1)
            state["k_parity"] = state["k_parity"].at[
                :, phys, :, :, slots].set(kp.astype(state["k_parity"].dtype))
            state["v_parity"] = state["v_parity"].at[
                :, phys, :, :, slots].set(vp.astype(state["v_parity"].dtype))
        logits = _lm_head_tp(params, x, cfgl)[:, 0]
        state["context_len"] = pos + 1
        if collect_ecc_stats:
            # one psum over the model axis per step: global per-sequence
            # counters, identical on every shard
            state["ecc_corrected"] = jax.lax.psum(corr, "model")
            state["ecc_detected"] = jax.lax.psum(det, "model")
        return logits, state

    def _wrap(fn, n_extra_data_args=0, out_state_specs=None):
        extra = tuple(P("data") for _ in range(n_extra_data_args))
        shard_fn = jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(pspecs, data_spec, state_specs, P("data"), P()) + extra,
            out_specs=(P("data"), out_state_specs or state_specs),
            check_vma=False,
        )
        return jax.jit(shard_fn, donate_argnums=(2,))

    decode_out_specs = state_specs
    if collect_ecc_stats:
        # the decode step ADDS the counter keys (the serving loop pops them
        # after each step, so they are never inputs)
        decode_out_specs = {
            **state_specs,
            "ecc_corrected": P("data"),
            "ecc_detected": P("data"),
        }
    return (
        init_state,
        _wrap(_prefill_shard, 2),
        _wrap(_decode_shard, out_state_specs=decode_out_specs),
    )


def generate_tp(
    params, input_ids, cfg: ModelConfig, policy: KVCachePolicy, mesh: Mesh,
    max_new_tokens: int = 16, block_size: int = 128,
):
    """Greedy TP generation across the mesh."""
    from .sharding import shard_params

    params = shard_params(params, cfg, mesh)
    input_ids = jnp.asarray(input_ids)
    B, S = input_ids.shape
    init_state, prefill_fn, decode_fn = make_tp_functions(
        cfg, policy, mesh, block_size
    )
    state, block_table = init_state(B, S + max_new_tokens)
    key = jax.random.key(policy.seed)
    ids_sharded = jax.device_put(input_ids, NamedSharding(mesh, P("data")))
    logits, state = prefill_fn(
        params, ids_sharded, state, block_table, key,
        jnp.full((B,), S - 1, jnp.int32), jnp.full((B,), S, jnp.int32),
    )
    tokens = [input_ids]
    for step in range(max_new_tokens):
        next_tok = jnp.argmax(logits, axis=-1)
        tokens.append(np.asarray(next_tok)[:, None])
        if step == max_new_tokens - 1:
            break
        logits, state = decode_fn(
            params, next_tok, state, block_table, jax.random.fold_in(key, S + step)
        )
    return jnp.concatenate([jnp.asarray(t) for t in tokens], axis=1)
