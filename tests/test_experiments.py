"""Smoke tests for the L4 experiment CLIs (reference evaluation/experiments/).

Each experiment module runs end-to-end on tiny shapes/models and emits its
artifact set; deeper statistical behavior is covered by tests/test_evaluation.py
(sweep/metrics) and the results/ artifacts produced on the chip.
"""

import numpy as np
import pytest

# slow tier: excluded from the fast correctness gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow



class TestLatencyExperiment:
    def test_grid_runs_and_reports(self):
        from qkv_ecc_tpu.evaluation.experiments.latency import (
            CodecBenchmarkConfig, format_report, run_latency_experiment,
        )

        cfg = CodecBenchmarkConfig(
            codecs=["hamming84", "golay"], shapes=[(512,)], trials=1, warmup=1
        )
        results = run_latency_experiment(cfg)
        assert len(results) == 2
        for r in results:
            assert r["n_values"] >= 512
            assert r["throughput_mvalues_sec"] > 0
        report = format_report(results)
        assert "hamming84" in report and "golay" in report


class TestQuantEccComparison:
    def test_matrix_runs(self):
        from qkv_ecc_tpu.evaluation.experiments.quantization_ecc_comparison import (
            QuantEccConfig, format_table, run_quantization_ecc_comparison,
        )

        cfg = QuantEccConfig(
            backends=["block_absmax", "kivi"],
            ecc_arms=["none", "golay"],
            ber_levels=[0.0, 1e-2],
            trials=1,
            shape=(8, 4, 24),
        )
        results = run_quantization_ecc_comparison(cfg, progress=lambda *_: None)
        assert len(results) == 2 * 2 * 2
        for r in results:
            # at BER 0 the codec roundtrip is lossless: post-ECC MSE is the
            # quantization MSE exactly
            if r["ber"] == 0.0:
                assert r["post_ecc_mse"] == pytest.approx(
                    r["quant_mse"], rel=1e-6
                )
        assert "block_absmax" in format_table(results)


class TestGenerationDemo:
    def test_repetition_analyzer(self):
        from qkv_ecc_tpu.evaluation.experiments.generation import (
            analyze_generation,
        )

        looped = analyze_generation([5, 7, 7, 7, 7, 7, 7, 7, 7])
        assert looped["repetition_loop"]
        clean = analyze_generation(list(range(20)))
        assert not clean["repetition_loop"]

    def test_demo_runs_all_modes(self):
        from qkv_ecc_tpu.evaluation.experiments.generation import (
            format_report, run_generation_demo,
        )

        results = run_generation_demo(
            model_name="tiny-gpt2",
            cache_modes=["fp16", "int12-golay"],
            ber=0.05,
            max_new_tokens=4,
            progress=lambda *_: None,
        )
        assert set(results) == {"fp16", "int12-golay"}
        for mode, entry in results.items():
            assert isinstance(entry["text"], str)
            assert len(entry["tokens"]) > 0
            assert 0.0 <= entry["agreement_with_clean"] <= 1.0
        assert "fp16" in format_report(results)


class TestArchitectureComparison:
    @pytest.fixture(scope="class")
    def comparison(self):
        from qkv_ecc_tpu.evaluation.experiments.architecture import (
            run_architecture_comparison,
        )

        return run_architecture_comparison(
            models=["tiny-gpt2", "tiny-llama"],
            cache_modes=["int12-golay"],
            ber_levels=[0.0],
            seeds=[42],
            max_samples=2,
            max_length=64,
            progress=lambda *_: None,
        )

    def test_both_architectures_swept(self, comparison):
        assert set(comparison) == {"tiny-gpt2", "tiny-llama"}
        a_gpt2 = comparison["tiny-gpt2"]["architecture"]
        a_llama = comparison["tiny-llama"]["architecture"]
        assert a_gpt2["kv_projection"] == "combined c_attn"
        assert a_llama["kv_projection"] == "separate k/v_proj"
        for entry in comparison.values():
            aggs = entry["results"].aggregated["int12-golay"]
            assert np.isfinite(aggs[0.0].ppl_mean)

    def test_report_and_plot(self, comparison, tmp_path):
        from qkv_ecc_tpu.evaluation.experiments.architecture import (
            format_report, plot_comparison,
        )

        report = format_report(comparison)
        assert "tiny-gpt2" in report and "tiny-llama" in report
        png = tmp_path / "arch.png"
        assert plot_comparison(comparison, str(png))
        assert png.stat().st_size > 0


class TestFaultToleranceBenchmark:
    def test_throughput_and_grid_tables(self):
        from qkv_ecc_tpu.evaluation.experiments.fault_tolerance_benchmark import (
            benchmark_decode_throughput, format_grid_tables, peak_memory_stats,
        )
        from qkv_ecc_tpu.evaluation.models import load_model
        from qkv_ecc_tpu.models.kv_policy import policy_for_mode

        params, cfg, _ = load_model("tiny-llama")
        r = benchmark_decode_throughput(
            params, cfg, policy_for_mode("int12-golay", ber=0.0, seed=42),
            batch=1, prompt_len=16, decode_tokens=4,
        )
        assert r["decode_tokens_per_sec"] > 0
        assert r["cache_bytes"] > 0
        r.update({"arm": "int12-golay", "context_len": 16})
        r["memory"] = peak_memory_stats()
        assert r["memory"]["live_array_bytes"] > 0
        tables = format_grid_tables([r])
        assert "THROUGHPUT (tokens/s)" in tables
        assert "int12-golay" in tables

    def test_ppl_vs_ber_shape(self):
        from qkv_ecc_tpu.evaluation.data import load_wikitext2_test
        from qkv_ecc_tpu.evaluation.experiments.fault_tolerance_benchmark import (
            benchmark_ppl_vs_ber,
        )
        from qkv_ecc_tpu.evaluation.models import load_model

        params, cfg, tokenizer = load_model("tiny-gpt2")
        texts = load_wikitext2_test(max_samples=1)
        out = benchmark_ppl_vs_ber(
            params, cfg, tokenizer, texts, arms=["int4-hamming84"],
            ber_levels=[0.0], seeds=[42], max_length=48,
        )
        assert len(out) == 1
        assert np.isfinite(out[0]["ppl_mean"])
