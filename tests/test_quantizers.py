"""Quantizer backend tests (mirrors reference tests/test_quantization_backends.py):
registry completeness, per-backend roundtrip MSE bounds, KIVI asymmetric
formula, KIVI key/value strategy split, and facade compatibility."""

import numpy as np
import jax.numpy as jnp
import pytest

from qkv_ecc_tpu.codecs import (
    INT4Quantizer,
    QUANTIZER_BACKENDS,
    QuantizationConfig,
    QuantizationMode,
    compute_quantization_scales,
    get_quantizer,
)


@pytest.fixture
def x(rng):
    return jnp.asarray(rng.normal(size=(4, 16, 64)).astype(np.float32))


class TestRegistry:
    def test_all_backends_constructible(self):
        for name in QUANTIZER_BACKENDS:
            q = get_quantizer(name)
            assert q.name

    def test_unknown_backend_raises(self):
        with pytest.raises(ValueError):
            get_quantizer("nope")

    def test_expected_backends_present(self):
        for name in [
            "block_absmax",
            "per_token",
            "per_channel",
            "kivi",
            "kivi_symmetric",
            "group_wise",
        ]:
            assert name in QUANTIZER_BACKENDS


class TestRoundtrip:
    @pytest.mark.parametrize(
        "name", ["block_absmax", "per_token", "per_channel", "kivi", "kivi_symmetric", "group_wise"]
    )
    def test_mse_bound(self, name, x):
        q = get_quantizer(name, QuantizationConfig(block_size=32, group_size=32))
        qt = q.quantize(x)
        xr = q.dequantize(qt)
        assert xr.shape == x.shape
        mse = float(jnp.mean((x - xr) ** 2))
        # INT4 roundtrip on unit-normal data: quantization step ~ scale, MSE
        # well under 0.1 for all backends.
        assert mse < 0.1, f"{name}: {mse}"

    @pytest.mark.parametrize("name", ["block_absmax", "per_token", "group_wise"])
    def test_q_range(self, name, x):
        q = get_quantizer(name, QuantizationConfig(block_size=32, group_size=32))
        data = q.quantize(x).data
        assert int(jnp.min(data)) >= 0 and int(jnp.max(data)) <= 15

    def test_zero_input(self):
        q = get_quantizer("per_token")
        qt = q.quantize(jnp.zeros((4, 8)))
        xr = q.dequantize(qt)
        assert float(jnp.max(jnp.abs(xr))) == 0.0


class TestKIVI:
    def test_asymmetric_formula(self, rng):
        """q = round((x - min) / scale), scale = (max - min) / 15."""
        x = jnp.asarray(rng.uniform(2.0, 6.0, size=(1, 32)).astype(np.float32))
        q = get_quantizer("kivi", QuantizationConfig(group_size=32))
        qt = q.quantize(x, QuantizationMode.VALUE)
        x_min, x_max = float(jnp.min(x)), float(jnp.max(x))
        expected_scale = (x_max - x_min) / 15.0
        assert np.isclose(float(qt.scales.reshape(-1)[0]), expected_scale, rtol=1e-5)
        assert np.isclose(float(qt.zero_points.reshape(-1)[0]), x_min, rtol=1e-5)
        # all-positive input still uses the full [0,15] range
        assert int(jnp.min(qt.data)) == 0 and int(jnp.max(qt.data)) == 15

    def test_key_value_strategy_split(self, x):
        q = get_quantizer("kivi", QuantizationConfig(group_size=32))
        qk = q.quantize(x, QuantizationMode.KEY)
        qv = q.quantize(x, QuantizationMode.VALUE)
        assert qk.metadata["per_channel"] is True
        assert qv.metadata["per_channel"] is False
        # per-channel scales collapse leading dims; per-token keeps them
        assert qk.scales.ndim == 1
        assert qv.scales.ndim == x.ndim

    def test_kivi_kv_roundtrip(self, x):
        q = get_quantizer("kivi", QuantizationConfig(group_size=32))
        qk, qv = q.quantize_kv(x, x)
        k, v = q.dequantize_kv(qk, qv)
        assert float(jnp.mean((x - k) ** 2)) < 0.1
        assert float(jnp.mean((x - v) ** 2)) < 0.1


class TestFacade:
    def test_quantize_kv_roundtrip(self, x):
        q = INT4Quantizer()
        data, scales = q.quantize_kv(x)
        xr = q.dequantize_kv(data, scales)
        assert float(jnp.mean((x - xr) ** 2)) < 0.05
        assert data.dtype == jnp.uint8
        assert int(jnp.min(data)) >= 0 and int(jnp.max(data)) <= 15

    def test_quantize_full(self, x):
        q = INT4Quantizer(block_size=32)
        data, scales = q.quantize_full(x)
        xr = q.dequantize_full(data, scales)
        assert float(jnp.mean((x - xr) ** 2)) < 0.05

    def test_scales_zero_rows_floor_one(self):
        scales = compute_quantization_scales(jnp.zeros((3, 8)))
        assert bool(jnp.all(scales == 1.0))

    def test_scale_formula(self):
        x = jnp.asarray([[0.0, -14.0, 7.0]])
        scales = compute_quantization_scales(x)
        assert np.isclose(float(scales[0]), 2.0)


class TestFused:
    def test_fused_equals_separate_h84(self, x):
        from qkv_ecc_tpu.codecs import (
            fused_quantize_encode_hamming84,
            hamming84_encode,
        )

        q = INT4Quantizer()
        data, scales = q.quantize_kv(x)
        cw_sep = hamming84_encode(data)
        cw_fused, scales_fused = fused_quantize_encode_hamming84(x)
        assert jnp.array_equal(cw_sep, cw_fused)
        assert jnp.allclose(scales, scales_fused)

    def test_fused_roundtrip_h84(self, x):
        from qkv_ecc_tpu.codecs import (
            fused_decode_dequantize_hamming84,
            fused_quantize_encode_hamming84,
        )

        cw, scales = fused_quantize_encode_hamming84(x)
        xr, (corrected, detected) = fused_decode_dequantize_hamming84(cw, scales)
        assert int(corrected) == 0 and int(detected) == 0
        assert float(jnp.mean((x - xr) ** 2)) < 0.05

    def test_fused_zeroes_double_errors(self):
        from qkv_ecc_tpu.codecs import (
            fused_decode_dequantize_hamming84,
            hamming84_encode,
        )

        vals = jnp.asarray([[5, 5]], dtype=jnp.uint8)
        cw = hamming84_encode(vals)
        cw = cw.at[0, 1].set(cw[0, 1] ^ jnp.uint8(0b11))
        scales = jnp.asarray([1.0])
        xr, (corrected, detected) = fused_decode_dequantize_hamming84(cw, scales)
        assert int(detected) == 1
        assert float(xr[0, 1]) == -8.0  # zeroed q -> (0-8)*scale

    def test_fused_roundtrip_h74(self, x):
        from qkv_ecc_tpu.codecs import (
            fused_decode_dequantize_hamming74,
            fused_quantize_encode_hamming74,
        )

        cw, scales = fused_quantize_encode_hamming74(x)
        xr, (corrected,) = fused_decode_dequantize_hamming74(cw, scales)
        assert int(corrected) == 0
        assert float(jnp.mean((x - xr) ** 2)) < 0.05

    @pytest.mark.parametrize("shape", [(16,), (3, 5, 8), (2, 3, 4, 16)])
    def test_fused_shapes(self, shape, rng):
        from qkv_ecc_tpu.codecs import fused_quantize_encode_hamming84

        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        cw, scales = fused_quantize_encode_hamming84(x)
        assert cw.shape == tuple(shape)
        assert scales.shape == tuple(shape[:-1])
