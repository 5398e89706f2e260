"""Codec core tests: exhaustive algebraic verification of the Hamming and
Golay codecs, roundtrip behavior, and error-classification semantics.

Mirrors the reference's codec property tests and verification module
(evaluation/verification.py, tests/test_fused_kernels.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from qkv_ecc_tpu.codecs import (
    ErrorType,
    GOLAY_SYNDROME_TABLE,
    GOLAY_UNCORRECTABLE_COUNT,
    Golay2412,
    Hamming74,
    Hamming84,
    golay_decode,
    golay_decode_algebraic,
    golay_encode,
    golay_pack,
    golay_unpack,
    hamming74_decode,
    hamming74_encode,
    hamming84_decode,
    hamming84_encode,
)
from qkv_ecc_tpu.codecs import algebra as A


class TestAlgebra:
    def test_hamming_g_h_orthogonal(self):
        gh = (A.HAMMING74_G.astype(int) @ A.HAMMING74_H.astype(int).T) % 2
        assert gh.sum() == 0

    def test_golay_g_h_orthogonal(self):
        gh = (A.GOLAY_G.astype(int) @ A.GOLAY_H.astype(int).T) % 2
        assert gh.sum() == 0

    def test_golay_b_symmetric_involutory(self):
        b = A.GOLAY_B_MATRIX.astype(int)
        assert np.array_equal(b, b.T)
        assert np.array_equal((b @ b) % 2, np.eye(12, dtype=int))

    def test_golay_syndrome_table_counts(self):
        t = GOLAY_SYNDROME_TABLE
        assert t.shape == (4096,)
        assert (t >= 0).sum() == 2325  # 1 + 24 + 276 + 2024
        assert t[0] == 0

    def test_golay_min_distance_8(self):
        """All 2^12 nonzero codewords have weight >= 8 (the code's minimum
        distance), proving 3-error correction capability."""
        data = np.arange(4096, dtype=np.int32)
        nibbles = np.stack(
            [(data >> 0) & 0xF, (data >> 4) & 0xF, (data >> 8) & 0xF], axis=-1
        ).astype(np.uint8)
        cw = np.asarray(golay_encode(jnp.asarray(nibbles))).astype(np.int64)
        weights = np.array([bin(int(c) & 0xFFFFFF).count("1") for c in cw.tolist()])
        assert weights[0] == 0
        assert weights[1:].min() == 8


class TestHamming74:
    def test_roundtrip_all_values(self):
        vals = jnp.arange(16, dtype=jnp.uint8)
        cw = hamming74_encode(vals)
        data, err, corrected = hamming74_decode(cw)
        assert jnp.array_equal(data, vals)
        assert not bool(jnp.any(err))
        assert int(corrected) == 0

    def test_corrects_every_single_bit_flip(self):
        vals = jnp.arange(16, dtype=jnp.uint8)
        cw = hamming74_encode(vals)
        for bit in range(7):
            corrupted = cw ^ jnp.uint8(1 << bit)
            data, err, corrected = hamming74_decode(corrupted)
            assert jnp.array_equal(data, vals), f"bit {bit}"
            assert bool(jnp.all(err))
            assert int(corrected) == 16

    def test_codewords_match_generator_matrix(self):
        """Kernel-style bit-twiddle encode must equal data @ G mod 2."""
        for v in range(16):
            d = np.array([(v >> i) & 1 for i in range(4)])
            expected_bits = (d @ A.HAMMING74_G.astype(int)) % 2
            expected = int(sum(int(b) << i for i, b in enumerate(expected_bits)))
            got = int(hamming74_encode(jnp.asarray([v], dtype=jnp.uint8))[0])
            assert got == expected, f"value {v}"


class TestHamming84SECDED:
    def test_roundtrip(self):
        vals = jnp.arange(16, dtype=jnp.uint8)
        cw = hamming84_encode(vals)
        data, et, corrected, detected = hamming84_decode(cw)
        assert jnp.array_equal(data, vals)
        assert bool(jnp.all(et == ErrorType.NO_ERROR))
        assert (int(corrected), int(detected)) == (0, 0)

    def test_even_weight_codewords(self):
        cw = np.asarray(hamming84_encode(jnp.arange(16, dtype=jnp.uint8)))
        for c in cw:
            assert bin(int(c)).count("1") % 2 == 0

    def test_single_errors_corrected_exhaustive(self):
        vals = jnp.arange(16, dtype=jnp.uint8)
        cw = hamming84_encode(vals)
        for bit in range(8):
            corrupted = cw ^ jnp.uint8(1 << bit)
            data, et, corrected, detected = hamming84_decode(corrupted)
            assert jnp.array_equal(data, vals), f"bit {bit}"
            assert int(detected) == 0
            if bit == 7:
                assert bool(jnp.all(et == ErrorType.PARITY_ONLY))
            else:
                assert bool(jnp.all(et == ErrorType.SINGLE_CORRECTED))
                assert int(corrected) == 16

    def test_double_errors_detected_never_miscorrected_exhaustive(self):
        """The SECDED guarantee: every 2-bit flip is classified
        DOUBLE_DETECTED, never silently 'corrected' into wrong data
        (reference verification.py:282-392, miscorrection_rate == 0 gate)."""
        vals = jnp.arange(16, dtype=jnp.uint8)
        cw = hamming84_encode(vals)
        for b1 in range(8):
            for b2 in range(b1 + 1, 8):
                corrupted = cw ^ jnp.uint8((1 << b1) | (1 << b2))
                data, et, corrected, detected = hamming84_decode(corrupted)
                assert bool(jnp.all(et == ErrorType.DOUBLE_DETECTED)), (b1, b2)
                assert int(corrected) == 0
                assert int(detected) == 16

    def test_double_error_preserves_data_bits(self):
        """On DOUBLE_DETECTED the possibly-corrupt data nibble is returned
        unmodified, not zeroed (reference hamming84_triton.py:201-203)."""
        vals = jnp.asarray([5], dtype=jnp.uint8)
        cw = hamming84_encode(vals)
        corrupted = cw ^ jnp.uint8(0b11)  # flip d0 and d1
        data, et, _, _ = hamming84_decode(corrupted)
        assert int(et[0]) == ErrorType.DOUBLE_DETECTED
        assert int(data[0]) == (5 ^ 0b11)


class TestGolay:
    def test_roundtrip_all_4096(self):
        data = jnp.arange(4096, dtype=jnp.int32)
        nibbles = golay_unpack(data)
        cw = golay_encode(nibbles)
        dec, cnt, corrected_bits, unc = golay_decode(cw)
        assert jnp.array_equal(dec, nibbles)
        assert bool(jnp.all(cnt == 0))
        assert int(corrected_bits) == 0 and int(unc) == 0

    def test_pack_unpack(self):
        rng = np.random.default_rng(0)
        trip = jnp.asarray(rng.integers(0, 16, (100, 3), dtype=np.uint8))
        assert jnp.array_equal(golay_unpack(golay_pack(trip)), trip)

    @pytest.mark.parametrize("weight", [1, 2, 3])
    def test_corrects_up_to_three_errors_random(self, weight, rng):
        trip = jnp.asarray(rng.integers(0, 16, (256, 3), dtype=np.uint8))
        cw = golay_encode(trip)
        flips = np.zeros(256, dtype=np.int64)
        for r in range(256):
            for b in rng.choice(24, size=weight, replace=False):
                flips[r] |= 1 << int(b)
        corrupted = cw ^ jnp.asarray(flips, dtype=jnp.int32)
        dec, cnt, corrected_bits, unc = golay_decode(corrupted)
        assert jnp.array_equal(dec, trip)
        assert bool(jnp.all(cnt == weight))
        assert int(corrected_bits) == 256 * weight
        assert int(unc) == 0

    def test_single_bit_flips_exhaustive(self):
        trip = jnp.asarray([[3, 7, 12]], dtype=jnp.uint8)
        cw = golay_encode(trip)
        for bit in range(24):
            corrupted = cw ^ jnp.int32(1 << bit)
            dec, cnt, _, unc = golay_decode(corrupted)
            assert jnp.array_equal(dec[0], trip[0]), f"bit {bit}"
            assert int(cnt[0]) == 1 and int(unc) == 0

    def test_four_errors_uncorrectable_preserves_data(self, rng):
        trip = jnp.asarray(rng.integers(0, 16, (128, 3), dtype=np.uint8))
        cw = golay_encode(trip)
        flips = np.zeros(128, dtype=np.int64)
        for r in range(128):
            for b in rng.choice(24, size=4, replace=False):
                flips[r] |= 1 << int(b)
        corrupted = cw ^ jnp.asarray(flips, dtype=jnp.int32)
        dec, cnt, _, unc = golay_decode(corrupted)
        # Weight-4 patterns either land in an uncorrectable coset (detected,
        # data preserved as-corrupted) or alias to a weight<=3 correction of a
        # *different* codeword; never a silent exact match plus count 0.
        uncorrectable_mask = np.asarray(cnt) == GOLAY_UNCORRECTABLE_COUNT
        preserved = np.asarray(golay_unpack(corrupted & 0xFFF))
        assert int(unc) == int(uncorrectable_mask.sum())
        assert np.array_equal(
            np.asarray(dec)[uncorrectable_mask], preserved[uncorrectable_mask]
        )

    def test_algebraic_decoder_matches_lut_exhaustive_w3(self):
        """The LUT-free arithmetic decoder (used in the Pallas kernels) must
        agree with the syndrome-LUT decoder on every error pattern of weight
        <= 3 and on uncorrectability for random heavier patterns."""
        base = golay_encode(jnp.asarray([[9, 2, 14]], dtype=jnp.uint8))
        patterns = [0]
        patterns += [1 << i for i in range(24)]
        patterns += [(1 << i) | (1 << j) for i in range(24) for j in range(i + 1, 24)]
        patterns += [
            (1 << i) | (1 << j) | (1 << k)
            for i in range(24)
            for j in range(i + 1, 24)
            for k in range(j + 1, 24)
        ]
        cw = base[0] ^ jnp.asarray(patterns, dtype=jnp.int32)
        d_lut, c_lut, _, unc_lut = golay_decode(cw)
        d_alg, c_alg, _, unc_alg = golay_decode_algebraic(cw)
        assert jnp.array_equal(d_lut, d_alg)
        assert jnp.array_equal(c_lut, c_alg)
        assert int(unc_lut) == int(unc_alg) == 0

    def test_algebraic_decoder_matches_lut_random_heavy(self, rng):
        cw = jnp.asarray(
            rng.integers(0, 1 << 24, size=(4096,), dtype=np.int64), dtype=jnp.int32
        )
        d_lut, c_lut, _, unc_lut = golay_decode(cw)
        d_alg, c_alg, _, unc_alg = golay_decode_algebraic(cw)
        assert jnp.array_equal(c_lut, c_alg)
        assert jnp.array_equal(d_lut, d_alg)
        assert int(unc_lut) == int(unc_alg)


class TestCodecClasses:
    def test_hamming74_class(self):
        c = Hamming74()
        vals = jnp.arange(16, dtype=jnp.uint8)
        data, err, n = c.decode(c.encode(vals))
        assert jnp.array_equal(data, vals) and n == 0

    def test_hamming84_class(self):
        c = Hamming84()
        vals = jnp.arange(16, dtype=jnp.uint8)
        data, stats = c.decode(c.encode(vals))
        assert jnp.array_equal(data, vals) and stats == (0, 0)
        data, et, stats = c.decode(c.encode(vals), return_error_types=True)
        assert bool(jnp.all(et == ErrorType.NO_ERROR))

    def test_golay_class_verify_properties(self):
        assert Golay2412().verify_properties()


def test_golay_correct_data_matches_full_decoder(rng):
    """The attention fast-path corrector must agree with the full IMLD
    decoder (zero_uncorrectable semantics) on random corrupted codewords."""
    import jax.numpy as jnp
    from qkv_ecc_tpu.codecs.algebra import GOLAY_B_ROW_MASKS
    from qkv_ecc_tpu.kernels.common import (
        golay_correct_data_i32, golay_decode_i32, golay_encode_i32)

    masks = tuple(int(m) for m in GOLAY_B_ROW_MASKS)
    data = jnp.asarray(rng.integers(0, 4096, (4096,)), jnp.int32)
    cw = golay_encode_i32(data, masks)
    # flip 0-5 random bits per codeword (covers correctable + uncorrectable)
    nflips = rng.integers(0, 6, cw.shape)
    flip = np.zeros(cw.shape, np.int32)
    for j in range(cw.shape[0]):
        for pos in rng.choice(24, size=nflips[j], replace=False):
            flip[j] |= 1 << pos
    corrupted = cw ^ jnp.asarray(flip)
    full, _ = golay_decode_i32(corrupted, masks, zero_uncorrectable=True)
    fast = golay_correct_data_i32(corrupted, masks)
    assert jnp.array_equal(full, fast)


def test_hamming_correct_data_matches_full_decoder(rng):
    """Data-only fast correctors agree with the full decoders on every
    possible byte (exhaustive: all 256 uint8 codeword values)."""
    import jax.numpy as jnp
    from qkv_ecc_tpu.kernels.common import (
        hamming74_correct_data_i32, hamming74_decode_i32,
        hamming84_correct_data_i32, hamming84_decode_i32)

    all_bytes = jnp.arange(256, dtype=jnp.int32)
    d74, _ = hamming74_decode_i32(all_bytes & 0x7F)
    assert jnp.array_equal(d74, hamming74_correct_data_i32(all_bytes))
    d84, _ = hamming84_decode_i32(all_bytes)
    assert jnp.array_equal(d84, hamming84_correct_data_i32(all_bytes))


def test_golay_write_scrub_kernel_matches_jnp_chain(rng):
    """The fused write-path kernel (encode + inject-XOR + IMLD correct +
    re-encode in one Pallas launch) is bit-identical to the unfused jnp
    chain scrub_codewords(golay_encode_wide(d12) ^ mask), including
    uncorrectable (-> zero codeword) and miscorrection cases (mask weights
    up to ~6 at 12% per-bit density)."""
    import jax.numpy as jnp
    from qkv_ecc_tpu.kernels import swar
    from qkv_ecc_tpu.kernels.codec_kernels import golay_write_scrub_tpu

    d12 = jnp.asarray(rng.integers(0, 4096, (4, 1, 8, 44)), jnp.int32)
    bits = rng.random((4, 1, 8, 44, 24)) < 0.12
    mask = jnp.asarray((bits << np.arange(24)).sum(-1), jnp.int32)
    ref = swar.scrub_codewords("golay", swar.golay_encode_wide(d12) ^ mask)
    assert jnp.array_equal(ref, golay_write_scrub_tpu(d12, mask))
    # zero mask: scrub of clean codewords is the encode itself
    zero = jnp.zeros_like(mask)
    assert jnp.array_equal(
        swar.golay_encode_wide(d12), golay_write_scrub_tpu(d12, zero)
    )


def test_encode_kv_scrubbed_matches_unfused(rng):
    """encode_kv_scrubbed == scrub_codewords(encode_kv(...)) with the same
    threefry mask stream, for every packed-int codec and BER incl. heavy
    corruption."""
    import jax
    import jax.numpy as jnp
    from qkv_ecc_tpu.kernels import swar
    from qkv_ecc_tpu.models.kv_policy import (
        KVCachePolicy, encode_kv, encode_kv_scrubbed)

    x = jnp.asarray(rng.standard_normal((4, 1, 8, 128)), jnp.float32)
    for codec in ("golay", "hamming84", "hamming74"):
        for ber in (0.0, 1e-2, 8e-2):
            pol = KVCachePolicy(codec=codec, ber=ber, inject_errors=ber > 0,
                                seed=42)
            key = jax.random.key(7)
            enc, sc, _ = encode_kv(x, pol, key)
            got, sc2 = encode_kv_scrubbed(x, pol, key)
            assert jnp.array_equal(swar.scrub_codewords(codec, enc), got), (
                codec, ber)
            assert jnp.array_equal(sc, sc2)


def test_encode_kv_pair_scrubbed_matches_per_tensor(rng):
    """encode_kv_pair_scrubbed (K/V batched into one golay scrub launch) is
    bit-identical to two encode_kv_scrubbed calls: same threefry mask
    streams, same scales - for every codec and BER the decode path uses."""
    import jax
    import jax.numpy as jnp
    from qkv_ecc_tpu.models.kv_policy import (
        KVCachePolicy, encode_kv_pair_scrubbed, encode_kv_scrubbed)

    k = jnp.asarray(rng.standard_normal((4, 1, 8, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 1, 8, 128)), jnp.float32)
    base = jax.random.key(11)
    kk = jax.random.fold_in(base, 0)
    vk = jax.random.fold_in(base, 1)
    for codec in ("golay", "hamming84", "hamming74", "int4"):
        for ber in (0.0, 1e-2, 8e-2):
            pol = KVCachePolicy(codec=codec, ber=ber, inject_errors=ber > 0,
                                seed=42)
            (kc, ks), (vc, vs) = encode_kv_pair_scrubbed(k, v, pol, kk, vk)
            kc_ref, ks_ref = encode_kv_scrubbed(k, pol, kk)
            vc_ref, vs_ref = encode_kv_scrubbed(v, pol, vk)
            assert jnp.array_equal(kc, kc_ref), (codec, ber)
            assert jnp.array_equal(vc, vc_ref), (codec, ber)
            assert jnp.array_equal(ks, ks_ref) and jnp.array_equal(vs, vs_ref)


def test_scrub_fold_mask_algebra(rng):
    """The round-4 write path rests on one identity: for a linear code,

        scrub_codewords(codec, encode(q) ^ mask) == encode(q ^ fold(mask))

    with fold = swar.scrub_fold_mask (the data correction the decoder
    would apply to the mask alone). Checked bit-for-bit for every codec at
    mask densities up to 12% per bit (covers singles, doubles, golay
    triples, miscorrections, and uncorrectable -> zero-codeword cases)."""
    import jax.numpy as jnp
    from qkv_ecc_tpu.kernels import swar

    q = jnp.asarray(rng.integers(0, 16, (4, 1, 8, 96)), jnp.int32)
    for codec, n_bits in (("int4", 4), ("hamming74", 7), ("hamming84", 8)):
        enc = swar.encode_codewords(codec, q, 96)
        bits = rng.random(enc.shape + (n_bits,)) < 0.12
        mask = jnp.asarray(
            (bits << np.arange(n_bits)).sum(-1), jnp.int32
        )
        ref = swar.scrub_codewords(codec, enc ^ mask)
        delta = swar.scrub_fold_mask(codec, mask)
        qp = jnp.pad(q, [(0, 0)] * 3 + [(0, enc.shape[-1] - 96)])
        got = swar.encode_codewords(codec, (qp ^ delta) & 0xF, enc.shape[-1])
        assert jnp.array_equal(ref, got), codec
    # golay: 24-bit masks, uncorrectable scrubs to the all-zero codeword.
    # The fold is NIBBLE-domain (per-value delta | uncorrectable<<4,
    # thirds order): apply to the unpacked values and re-pack.
    d12 = jnp.asarray(rng.integers(0, 4096, (4, 1, 8, 44)), jnp.int32)
    bits = rng.random((4, 1, 8, 44, 24)) < 0.12
    mask = jnp.asarray((bits << np.arange(24)).sum(-1), jnp.int32)
    ref = swar.scrub_codewords("golay", swar.golay_encode_wide(d12) ^ mask)
    delta = swar.scrub_fold_mask("golay", mask)  # [..., 132] nibble domain
    qn = swar.golay_unpack_thirds(d12)
    qn = jnp.where((delta >> 4) & 1 != 0, 0, qn ^ (delta & 0xF))
    assert jnp.array_equal(
        ref, swar.golay_encode_wide(swar.golay_pack_thirds(qn))
    )
    # a zero mask folds to a zero delta (clean writes store the encode)
    zero_fold = swar.scrub_fold_mask("golay", jnp.zeros_like(mask))
    assert zero_fold.shape == mask.shape[:-1] + (3 * mask.shape[-1],)
    assert not jnp.any(zero_fold)


def test_hoisted_write_deltas_bit_identical(rng):
    """The hoisted all-layers folded-delta draw (hoisted_write_deltas)
    produces the SAME codewords as the per-layer draw-and-fold path - the
    injection streams must not shift when the decode step hoists mask
    generation (and the scrub fold, incl. golay's IMLD) to the step top."""
    import jax
    import jax.numpy as jnp
    from qkv_ecc_tpu.kernels import swar
    from qkv_ecc_tpu.models.kv_policy import (
        KVCachePolicy, encode_kv_pair_scrubbed, hoisted_write_deltas)
    from qkv_ecc_tpu.models.runtime import (
        _layer_kv_key, _stacked_layer_kv_keys)

    L, B, H, D = 3, 2, 4, 64
    for codec in ("golay", "hamming84", "hamming74"):
        pol = KVCachePolicy(codec=codec, ber=2e-2, inject_errors=True, seed=7)
        step_key = jax.random.fold_in(jax.random.key(5), 1000000)
        if codec == "golay":
            shape = (B, 1, H, swar.padded_values("golay", D) // 3)
        else:
            shape = (B, 1, H, swar.padded_values(codec, D))
        deltas = hoisted_write_deltas(
            pol, _stacked_layer_kv_keys(L, step_key), shape
        )
        for i in range(L):
            k = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
            kk, vk = _layer_kv_key(pol, i, step_key)
            (kc, ks), (vc, vs) = encode_kv_pair_scrubbed(
                k, v, pol, kk, vk,
                k_folded=deltas[i, 0], v_folded=deltas[i, 1],
            )
            (kc_r, ks_r), (vc_r, vs_r) = encode_kv_pair_scrubbed(
                k, v, pol, kk, vk
            )
            assert jnp.array_equal(kc, kc_r) and jnp.array_equal(vc, vc_r), (
                codec, i)
            assert jnp.array_equal(ks, ks_r) and jnp.array_equal(vs, vs_r)
