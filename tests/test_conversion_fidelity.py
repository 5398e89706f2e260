"""Conversion fidelity for the big-model targets (VERDICT round-1 gap #7):
Llama-3.1 rope scaling, Mistral (incl. sliding window), and GQA configs
where head_dim != hidden/heads, each proven by offline logits parity
against transformers' own forward on random-weight HF models."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# slow tier: excluded from the fast correctness gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow


from qkv_ecc_tpu.models.config import ModelConfig, TINY_LLAMA
from qkv_ecc_tpu.models.kv_policy import KVCachePolicy, policy_for_mode
from qkv_ecc_tpu.models.registry import forward, init_params

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def _to_f32(cfg):
    return dataclasses.replace(cfg, dtype="float32", name=cfg.name + "-f32")


def _parity(hf, params, cfg, ids, atol=0.05):
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    ours, _ = forward(
        params, jnp.asarray(ids), _to_f32(cfg), KVCachePolicy(codec="fp16")
    )
    ours = np.asarray(ours)
    assert np.abs(ours - hf_logits).max() < atol, np.abs(ours - hf_logits).max()
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).mean() > 0.99


class TestLlama31RopeScaling:
    def test_rope_scaling_logits_match_hf(self, rng):
        """Llama-3.1 NTK-by-parts rope scaling (layers.py:_llama3_freq
        _scaling) against HF's rope_type='llama3' implementation. head_dim
        is small so several frequencies land in each of the three scaling
        regimes (long/medium/short wavelength)."""
        cfg = dataclasses.replace(
            TINY_LLAMA,
            name="tiny-llama31",
            head_dim=32,
            hidden_size=128,
            rope_theta=10000.0,
            rope_scaling_llama3=True,
            max_position_embeddings=16384,
        )
        hf_cfg = transformers.LlamaConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
            max_position_embeddings=cfg.max_position_embeddings,
            rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_norm_eps,
            tie_word_embeddings=cfg.tie_word_embeddings,
            attention_dropout=0.0,
            rope_scaling={
                "rope_type": "llama3",
                "factor": 8.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192,
            },
        )
        torch.manual_seed(0)
        hf = transformers.LlamaForCausalLM(hf_cfg).eval()
        from qkv_ecc_tpu.models.convert import convert_hf_model

        params = convert_hf_model(hf, cfg)
        ids = rng.integers(0, cfg.vocab_size, size=(2, 48))
        _parity(hf, params, cfg, ids)

    def test_scaling_changes_frequencies(self):
        from qkv_ecc_tpu.models.layers import rope_frequencies

        plain = np.asarray(rope_frequencies(32, 10000.0, False))
        scaled = np.asarray(rope_frequencies(32, 10000.0, True))
        # low-frequency (long-wavelength) components are divided by 8
        assert not np.allclose(plain, scaled)
        assert np.allclose(scaled[-1], plain[-1] / 8.0, rtol=1e-6)
        # highest frequencies are untouched
        assert np.allclose(scaled[0], plain[0], rtol=1e-6)


class TestMistral:
    def _cfg(self, sliding_window):
        return dataclasses.replace(
            TINY_LLAMA,
            name="tiny-mistral",
            num_heads=4,
            num_kv_heads=2,
            head_dim=16,
            rope_theta=1000000.0,
            tie_word_embeddings=False,
            sliding_window=sliding_window,
        )

    def _hf(self, cfg):
        hf_cfg = transformers.MistralConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
            max_position_embeddings=cfg.max_position_embeddings,
            rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_norm_eps,
            tie_word_embeddings=cfg.tie_word_embeddings,
            sliding_window=cfg.sliding_window,
            attention_dropout=0.0,
            attn_implementation="eager",
        )
        torch.manual_seed(0)
        return transformers.MistralForCausalLM(hf_cfg).eval()

    def test_mistral_conversion_logits_match_hf(self, rng):
        cfg = self._cfg(sliding_window=None)
        hf = self._hf(cfg)
        from qkv_ecc_tpu.models.convert import convert_hf_model

        params = convert_hf_model(hf, cfg)
        ids = rng.integers(0, cfg.vocab_size, size=(2, 24))
        _parity(hf, params, cfg, ids)

    def test_sliding_window_logits_match_hf(self, rng):
        """sliding_window < sequence length so the window mask is active:
        our prefill mask must match HF Mistral's eager implementation."""
        cfg = self._cfg(sliding_window=8)
        hf = self._hf(cfg)
        from qkv_ecc_tpu.models.convert import convert_hf_model

        params = convert_hf_model(hf, cfg)
        ids = rng.integers(0, cfg.vocab_size, size=(2, 24))
        _parity(hf, params, cfg, ids)

    def test_sliding_window_changes_output(self, rng):
        """The window genuinely masks (windowed != full attention)."""
        cfg_full = self._cfg(sliding_window=None)
        cfg_win = self._cfg(sliding_window=4)
        params = init_params(cfg_full, 0)
        ids = jnp.asarray(rng.integers(0, 256, size=(1, 20)))
        pol = KVCachePolicy(codec="fp16")
        a, _ = forward(params, ids, cfg_full, pol)
        b, _ = forward(params, ids, cfg_win, pol)
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_sliding_window_generation_incremental_matches_teacher_forced(
        self, rng
    ):
        """The fused kernel's decode-time window mask must agree with the
        jnp prefill mask: greedy incremental decode == teacher-forced
        forward over the same tokens."""
        from qkv_ecc_tpu.models.runtime import generate

        cfg = self._cfg(sliding_window=8)
        params = init_params(cfg, 0)
        ids = jnp.asarray(rng.integers(0, 256, size=(2, 12)))
        pol = policy_for_mode("int4-hamming84")
        out = generate(params, ids, cfg, pol, max_new_tokens=6, block_size=16)
        logits, _ = forward(params, out, cfg, pol)
        greedy = jnp.argmax(logits[:, 11:-1], axis=-1)
        assert bool(jnp.all(greedy == out[:, 12:]))


class TestDecoupledHeadDim:
    def test_gqa_head_dim_not_hidden_over_heads(self, rng):
        """Llama-3-style configs can set head_dim independently of
        hidden_size/num_heads; conversion and forward must handle
        q/k/v_proj shaped [hidden, heads*head_dim] with
        heads*head_dim != hidden."""
        cfg = dataclasses.replace(
            TINY_LLAMA,
            name="tiny-gqa-hd",
            hidden_size=64,
            num_heads=4,
            num_kv_heads=2,
            head_dim=24,  # != 64/4
        )
        hf_cfg = transformers.LlamaConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            num_key_value_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
            max_position_embeddings=cfg.max_position_embeddings,
            rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_norm_eps,
            tie_word_embeddings=cfg.tie_word_embeddings,
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        hf = transformers.LlamaForCausalLM(hf_cfg).eval()
        from qkv_ecc_tpu.models.convert import convert_hf_model

        params = convert_hf_model(hf, cfg)
        assert params["layers"][0]["q_proj"].shape == (64, 4 * 24)
        assert params["layers"][0]["k_proj"].shape == (64, 2 * 24)
        ids = rng.integers(0, cfg.vocab_size, size=(2, 16))
        _parity(hf, params, cfg, ids)
