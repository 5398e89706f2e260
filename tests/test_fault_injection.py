"""Fault injection tests: BER fidelity, determinism, XOR relationship, and
bit-range confinement (mirrors reference tests/test_triton_fault_injection.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qkv_ecc_tpu.codecs import inject_bit_errors, verify_ber_fidelity, verify_determinism


class TestBERFidelity:
    @pytest.mark.parametrize("ber", [1e-3, 1e-2, 0.1])
    @pytest.mark.parametrize("n_bits", [4, 8])
    def test_empirical_ber_uint8(self, ber, n_bits):
        n = 200_000
        data = jnp.zeros((n,), dtype=jnp.uint8)
        _, (flips, _) = inject_bit_errors(data, ber, n_bits, seed=7, return_stats=True)
        empirical = flips / (n * n_bits)
        assert abs(empirical - ber) < 5 * (ber * (1 - ber) / (n * n_bits)) ** 0.5 + 1e-6

    def test_empirical_ber_int32_24bits(self):
        n = 100_000
        data = jnp.zeros((n,), dtype=jnp.int32)
        _, (flips, _) = inject_bit_errors(data, 0.01, 24, seed=3, return_stats=True)
        empirical = flips / (n * 24)
        assert abs(empirical - 0.01) < 0.002

    def test_verifier_helpers(self):
        ok, _ = verify_ber_fidelity(ber=0.01, n_bits=8, n=500_000)
        assert ok
        assert verify_determinism()


class TestDeterminism:
    def test_same_seed_identical(self):
        data = jnp.arange(4096, dtype=jnp.int32).astype(jnp.uint8)
        a = inject_bit_errors(data, 0.05, 8, seed=11)
        b = inject_bit_errors(data, 0.05, 8, seed=11)
        assert jnp.array_equal(a, b)

    def test_different_seed_differs(self):
        data = jnp.zeros(4096, dtype=jnp.uint8)
        a = inject_bit_errors(data, 0.05, 8, seed=11)
        b = inject_bit_errors(data, 0.05, 8, seed=12)
        assert not jnp.array_equal(a, b)

    def test_key_based_api(self):
        data = jnp.zeros(1024, dtype=jnp.uint8)
        key = jax.random.key(99)
        a = inject_bit_errors(data, 0.05, 8, key=key)
        b = inject_bit_errors(data, 0.05, 8, key=key)
        assert jnp.array_equal(a, b)


class TestXORProperties:
    def test_only_lower_bits_touched(self):
        data = jnp.zeros(50_000, dtype=jnp.uint8)
        out = inject_bit_errors(data, 0.2, 4, seed=5)
        assert int(jnp.max(out)) < 16  # bits 4-7 untouched

    def test_golay_bits_confined_to_24(self):
        data = jnp.zeros(50_000, dtype=jnp.int32)
        out = inject_bit_errors(data, 0.2, 24, seed=5)
        assert int(jnp.max(out)) < (1 << 24)
        assert int(jnp.min(out)) >= 0

    def test_xor_relationship(self):
        """corruption mask is independent of the data content: flipping the
        same seed over different data yields the same XOR difference."""
        d1 = jnp.zeros(8192, dtype=jnp.uint8)
        d2 = jnp.asarray(np.random.default_rng(0).integers(0, 256, 8192), jnp.uint8)
        m1 = inject_bit_errors(d1, 0.05, 8, seed=21) ^ d1
        m2 = inject_bit_errors(d2, 0.05, 8, seed=21) ^ d2
        assert jnp.array_equal(m1, m2)

    def test_zero_ber_identity(self):
        data = jnp.arange(100, dtype=jnp.int32)
        out, stats = inject_bit_errors(data, 0.0, 24, seed=1, return_stats=True)
        assert jnp.array_equal(out, data)
        assert stats == (0, 0)

    def test_stats_consistency(self):
        data = jnp.zeros(10_000, dtype=jnp.uint8)
        out, (flips, affected) = inject_bit_errors(
            data, 0.03, 8, seed=2, return_stats=True
        )
        # popcount of all outputs == total flips; nonzero elements == affected
        pops = int(jnp.sum(jax.lax.population_count(out.astype(jnp.int32))))
        assert pops == flips
        assert int(jnp.sum(out != 0)) == affected

    @pytest.mark.parametrize("shape", [(0,), (1,), (7, 13), (2, 3, 5, 8)])
    def test_shapes(self, shape):
        data = jnp.zeros(shape, dtype=jnp.uint8)
        out = inject_bit_errors(data, 0.5, 8, seed=1)
        assert out.shape == tuple(shape)


class TestEndToEndWithCodecs:
    def test_hamming84_corrects_injected_at_low_ber(self):
        from qkv_ecc_tpu.codecs import hamming84_decode, hamming84_encode

        vals = jnp.asarray(
            np.random.default_rng(1).integers(0, 16, 50_000), dtype=jnp.uint8
        )
        cw = hamming84_encode(vals)
        corrupted, (flips, _) = inject_bit_errors(
            cw, 1e-3, 8, seed=42, return_stats=True
        )
        data, et, corrected, detected = hamming84_decode(corrupted)
        # At BER 1e-3, nearly all corrupted codewords carry a single flip.
        assert flips > 0
        assert int(corrected) + int(detected) * 0 <= flips
        # every single-error codeword decodes to the original value
        single = np.asarray(et) <= 1  # NO_ERROR or SINGLE_CORRECTED
        assert np.array_equal(np.asarray(data)[single], np.asarray(vals)[single])

    def test_golay_corrects_injected(self):
        from qkv_ecc_tpu.codecs import golay_decode, golay_encode

        rng = np.random.default_rng(2)
        trip = jnp.asarray(rng.integers(0, 16, (20_000, 3), dtype=np.uint8))
        cw = golay_encode(trip)
        corrupted = inject_bit_errors(cw, 1e-2, 24, seed=13)
        dec, cnt, corrected_bits, unc = golay_decode(corrupted)
        ok = np.asarray(cnt) <= 3
        assert np.array_equal(np.asarray(dec)[ok], np.asarray(trip)[ok])
        # at BER 1e-2 over 24 bits, ~98% of codewords have <=3 flips
        assert int(unc) < 0.02 * 20_000
