"""Evaluation harness tests: metrics math, sweep statistics, config
consistency, verification suite, LaTeX emitters, and CLI smoke runs
(mirrors reference tests/test_metrics.py, test_sweep_config.py,
test_benchmark_harness.py)."""

import json
import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

# slow tier: excluded from the fast correctness gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow


from qkv_ecc_tpu.evaluation import constants
from qkv_ecc_tpu.evaluation.data import ByteTokenizer, pad_to_bucket, synthetic_corpus, tokenize
from qkv_ecc_tpu.evaluation.sweep import (
    AggregatedResult,
    SweepConfig,
    TrialResult,
    _t_critical_95,
    run_sweep,
)
from qkv_ecc_tpu.models.config import TINY_GPT2
from qkv_ecc_tpu.models.kv_policy import MODE_CONFIG, KVCachePolicy, policy_for_mode
from qkv_ecc_tpu.models.registry import init_params


class TestConfigConsistency:
    """Guards the mode->codec single source of truth
    (reference tests/test_sweep_config.py)."""

    def test_every_cache_mode_has_mode_config(self):
        for mode in constants.CACHE_MODE_ORDER:
            assert mode in MODE_CONFIG
            assert mode in constants.CACHE_MODES
            assert mode in constants.CACHE_MODE_LABELS

    def test_all_codecs_supported_by_engine(self):
        from qkv_ecc_tpu.cache.engine import ECCEngineConfig

        for mode, cfg in MODE_CONFIG.items():
            assert cfg["codec"] in ECCEngineConfig.SUPPORTED_CODECS

    def test_legacy_modes_stay_removed(self):
        for legacy in ("adaptive", "sink", "int4-adaptive", "int4-sink"):
            assert legacy not in MODE_CONFIG
            assert legacy not in constants.CACHE_MODES

    def test_mode_config_policies_constructible(self):
        for mode in MODE_CONFIG:
            p = policy_for_mode(mode, ber=1e-3)
            assert isinstance(p, KVCachePolicy)

    def test_bits_match_codec(self):
        expected = {
            "fp16": 16, "fp8": 8, "int4": 4, "int4-hamming": 7,
            "int4-hamming84": 8, "int4-hamming84-interp": 8, "int12-golay": 8,
        }
        for mode, bits in expected.items():
            assert constants.CACHE_MODES[mode]["bits"] == bits

    def test_get_mode_config_unknown_raises(self):
        with pytest.raises(ValueError):
            constants.get_mode_config("bogus")

    def test_canonical_seed_list(self):
        # the publication seed list (first three used for the paper tables)
        assert constants.get_seeds() == [
            42, 101, 997, 1999, 4999, 7919, 10007, 15073, 21001, 31337,
        ]


class TestStatistics:
    def test_t_critical_table(self):
        assert _t_critical_95(2) == 4.303
        assert _t_critical_95(1000) == 1.96
        assert 2.021 < _t_critical_95(35) < 2.042  # interpolated

    def test_aggregation_bessel_and_ci(self):
        trials = [
            TrialResult("m", 0.01, s, perplexity=p)
            for s, p in zip([1, 2, 3], [10.0, 12.0, 14.0])
        ]
        agg = AggregatedResult.from_trials(trials)
        assert agg.ppl_mean == 12.0
        assert np.isclose(agg.ppl_std, 2.0)  # Bessel: sqrt(((4+0+4)/2))
        assert np.isclose(agg.ppl_ci95, 4.303 * 2.0 / math.sqrt(3))

    def test_single_trial_no_ci(self):
        agg = AggregatedResult.from_trials([TrialResult("m", 0, 1, perplexity=5.0)])
        assert agg.ppl_std == 0.0 and agg.ppl_ci95 == 0.0

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            AggregatedResult.from_trials([])


class TestDataUtils:
    def test_byte_tokenizer_roundtrip(self):
        t = ByteTokenizer()
        ids = t.encode("hello")
        assert t.decode(ids) == "hello"

    def test_tokenize_shape(self):
        ids = tokenize(ByteTokenizer(), "abcd", max_length=3)
        assert ids.shape == (1, 3)

    def test_pad_to_bucket(self):
        ids = np.arange(33, dtype=np.int32)[None]
        padded, labels, L = pad_to_bucket(ids, bucket=32)
        assert padded.shape == (1, 64) and L == 33
        assert (labels[0, 33:] == -100).all()
        assert (labels[0, :33] == ids[0]).all()

    def test_synthetic_corpus_deterministic(self):
        assert synthetic_corpus(3) == synthetic_corpus(3)


class TestVerificationSuite:
    def test_run_all_verifications(self):
        from qkv_ecc_tpu.evaluation.verification import run_all_verifications

        report = run_all_verifications()
        assert report.all_passed, report.format()
        # SECDED gate: exhaustive double flips, zero miscorrections
        assert report.amplification["hamming84_double"].miscorrected == 0
        assert report.amplification["hamming84_double"].detected == 448

    def test_gf2_rank(self):
        from qkv_ecc_tpu.evaluation.verification import gf2_rank

        assert gf2_rank(np.eye(4, dtype=np.uint8)) == 4
        m = np.array([[1, 1, 0], [0, 1, 1], [1, 0, 1]], np.uint8)  # row3=r1^r2
        assert gf2_rank(m) == 2


@pytest.fixture(scope="module")
def tiny_sweep_results():
    params = init_params(TINY_GPT2, 0)
    texts = synthetic_corpus(2, sentences_per_text=3)
    cfg = SweepConfig(
        cache_modes=["int4", "int12-golay"],
        ber_levels=[0, 1e-2],
        seeds=[42, 101],
        max_length=64,
        compute_kl_divergence=False,
        compute_top5=False,
        compute_catastrophic=False,
    )
    return run_sweep(params, TINY_GPT2, ByteTokenizer(), texts, cfg)


class TestSweep:
    def test_trial_count(self, tiny_sweep_results):
        assert len(tiny_sweep_results.trials) == 2 * 2 * 2

    def test_aggregated_structure(self, tiny_sweep_results):
        agg = tiny_sweep_results.get_aggregated("int12-golay", 1e-2)
        assert agg is not None and agg.n_trials == 2
        assert np.isfinite(agg.ppl_mean)

    def test_golay_counts_errors_at_ber(self, tiny_sweep_results):
        agg = tiny_sweep_results.get_aggregated("int12-golay", 1e-2)
        assert agg.errors_corrected_mean > 0
        clean = tiny_sweep_results.get_aggregated("int12-golay", 0)
        assert clean.errors_corrected_mean == 0

    def test_trial_filters(self, tiny_sweep_results):
        ts = tiny_sweep_results.get_trials(cache_mode="int4", ber=1e-2)
        assert len(ts) == 2
        assert all(t.cache_mode == "int4" for t in ts)

    def test_latex_tables(self, tiny_sweep_results):
        from qkv_ecc_tpu.evaluation.latex_tables import (
            format_all_latex_tables,
            format_perplexity_table,
        )

        tex = format_perplexity_table(tiny_sweep_results)
        assert r"\toprule" in tex and "Golay" in tex
        full = format_all_latex_tables(tiny_sweep_results)
        assert full.count(r"\begin{table}") >= 6

    def test_monte_carlo_save_artifacts(self, tiny_sweep_results, tmp_path):
        from qkv_ecc_tpu.evaluation.experiments.monte_carlo import (
            MonteCarloConfig,
            format_results_table,
            save_results,
        )

        cfg = MonteCarloConfig(model="tiny-gpt2", output_dir=str(tmp_path))
        table = save_results(tiny_sweep_results, cfg)
        assert "PERPLEXITY" in table
        for fname in (
            "monte_carlo_results.json",
            "results_table.txt",
            "results_table.tex",
            "paper_tables.tex",
            "tables/perplexity.tex",
            "tables/storage_overhead.tex",
            "tables/correction_rates.tex",
            "tables/throughput.tex",
        ):
            assert (tmp_path / fname).exists(), fname
        payload = json.loads((tmp_path / "monte_carlo_results.json").read_text())
        assert payload["config"]["model"] == "tiny-gpt2"
        assert len(payload["trials"]) == 8


class TestMetricsMath:
    def test_sliding_window_no_double_counting(self):
        """Total target_len across windows == seq_len (reference
        test_metrics.py:143)."""
        from qkv_ecc_tpu.evaluation.metrics import _text_windows

        ids = np.arange(300, dtype=np.int32)[None]
        total = sum(t for _, _, t in _text_windows(ids, max_length=128, stride=64))
        assert total == 300

    def test_sliding_window_label_masking(self):
        from qkv_ecc_tpu.evaluation.metrics import _text_windows

        ids = np.arange(100, dtype=np.int32)[None]
        windows = list(_text_windows(ids, max_length=64, stride=32))
        # second window starts at 32; first 32 positions already scored
        _, labels, _ = windows[1]
        assert (labels[0, :32] == -100).all()
        assert (labels[0, 32:] >= 0).all()

    def test_catastrophic_rate(self):
        from qkv_ecc_tpu.evaluation.metrics import compute_catastrophic_rate

        assert compute_catastrophic_rate([10, 2000, float("inf"), 5]) == 0.5
        assert compute_catastrophic_rate([]) == 0.0

    def test_kl_divergence_zero_for_identical(self):
        from qkv_ecc_tpu.evaluation.metrics import compute_kl_divergence

        logits = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
        assert abs(compute_kl_divergence(logits, logits)) < 1e-6

    def test_kl_divergence_positive(self):
        from qkv_ecc_tpu.evaluation.metrics import compute_kl_divergence

        rng = np.random.default_rng(0)
        a = rng.normal(size=(5, 16)).astype(np.float32)
        b = rng.normal(size=(5, 16)).astype(np.float32)
        assert compute_kl_divergence(a, b) > 0

    def test_perplexity_uniform_model(self):
        """A zero-logits model gives PPL == vocab_size."""
        from qkv_ecc_tpu.evaluation.metrics import compute_perplexity
        from qkv_ecc_tpu.models.config import TINY_GPT2

        params = init_params(TINY_GPT2, 0)
        zeroed = {**params, "wte": params["wte"] * 0, "wpe": params["wpe"] * 0}
        # zero embeddings -> logits constant across vocab -> PPL == V
        ppl = compute_perplexity(
            zeroed, TINY_GPT2, KVCachePolicy(codec="fp16"), ByteTokenizer(),
            ["hello world, this is a test"], max_length=32, stride=16,
        )
        assert np.isclose(ppl, TINY_GPT2.vocab_size, rtol=0.01)


class TestModelsLoading:
    def test_load_tiny_models(self):
        from qkv_ecc_tpu.evaluation.models import load_model

        params, cfg, tok = load_model("tiny-gpt2")
        assert cfg.arch == "gpt2" and isinstance(tok, ByteTokenizer)

    def test_unknown_model_raises(self):
        from qkv_ecc_tpu.evaluation.models import load_model

        with pytest.raises(ValueError):
            load_model("nonexistent")

    def test_param_count_estimate(self):
        from qkv_ecc_tpu.evaluation.models import estimate_param_count
        from qkv_ecc_tpu.models.config import GPT2_124M, LLAMA31_8B

        assert 110e6 < estimate_param_count(GPT2_124M) < 190e6
        assert 7e9 < estimate_param_count(LLAMA31_8B) < 9e9


def test_sweep_checkpoint_resume(tmp_path):
    """A restarted sweep skips completed trials recorded in the JSONL
    checkpoint and reproduces identical aggregates."""
    import dataclasses
    import jax.numpy as jnp
    from qkv_ecc_tpu.evaluation.sweep import (
        SweepConfig, run_sweep, load_sweep_checkpoint)
    from qkv_ecc_tpu.evaluation.models import load_model
    from qkv_ecc_tpu.evaluation.data import load_wikitext2_test

    params, cfg, tok = load_model("tiny-gpt2", allow_random_init=True)
    texts = load_wikitext2_test(max_samples=2)
    ckpt = str(tmp_path / "ckpt.jsonl")
    scfg = SweepConfig(
        cache_modes=["int4", "int12-golay"], ber_levels=[0.0, 1e-2],
        seeds=[42], max_length=64, compute_kl_divergence=False,
        compute_top5=False, compute_catastrophic=False,
        checkpoint_path=ckpt,
    )
    r1 = run_sweep(params, cfg, tok, texts, scfg)
    done = load_sweep_checkpoint(ckpt)
    assert len(done) == 4

    # resumed run executes zero new trials (checkpoint content identical)
    before = open(ckpt).read()
    r2 = run_sweep(params, cfg, tok, texts, scfg)
    assert open(ckpt).read() == before
    assert [dataclasses.asdict(t) for t in r2.trials] == [
        dataclasses.asdict(t) for t in r1.trials
    ]
