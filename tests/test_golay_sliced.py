"""Bit-sliced Golay IMLD (kernels/golay_sliced.py) vs the per-lane
arithmetic decoder (itself differential-tested against the syndrome-LUT
oracle in tests/test_codecs.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

# slow tier: excluded from the fast correctness gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow


from qkv_ecc_tpu.codecs.algebra import GOLAY_B_ROW_MASKS
from qkv_ecc_tpu.kernels import common as C
from qkv_ecc_tpu.kernels import golay_sliced as gs

BM = tuple(int(m) for m in GOLAY_B_ROW_MASKS)


def _bits_of_rows(planes, G, n_planes):
    """[n_planes*G, bs] plane-major -> [32G, bs] per-row values."""
    gi, zi = gs._gz_of_row(G)
    p = np.asarray(planes).reshape(n_planes, G, -1)
    bits = (p[:, gi, :] >> zi[None, :, None]) & 1  # [n_planes, R, bs]
    return (bits << np.arange(n_planes)[:, None, None]).sum(axis=0)


def _random_corrupted(rng, G, bs, max_errs=5):
    R = 32 * G
    data = rng.integers(0, 4096, (R, bs)).astype(np.int32)
    cw = np.asarray(C.golay_encode_i32(jnp.asarray(data), BM))
    nerr = rng.integers(0, max_errs + 1, (R, bs))
    for n in range(1, max_errs + 1):
        pos = rng.integers(0, 24, (R, bs))
        cw = np.where(nerr >= n, cw ^ (1 << pos), cw)
    return cw


@pytest.mark.parametrize("G", [12, 3, 2])
def test_pack_roundtrip(G):
    rng = np.random.default_rng(G)
    cw = rng.integers(0, 1 << 24, (32 * G, 16)).astype(np.int32)
    w = gs.golay_slice_pack(jnp.asarray(cw), G, axis=0)
    assert w.shape == (24 * G, 16)
    rt = np.asarray(gs.golay_slice_unpack(w, G, axis=0))
    np.testing.assert_array_equal(rt, cw)


@pytest.mark.parametrize("G", [12, 3])
def test_sliced_imld_matches_per_lane(G):
    rng = np.random.default_rng(7)
    cw = _random_corrupted(rng, G, 64)
    want_data, want_cnt = C.golay_decode_i32(
        jnp.asarray(cw), BM, zero_uncorrectable=True
    )
    want_data, want_cnt = np.asarray(want_data), np.asarray(want_cnt)

    w = gs.golay_slice_pack(jnp.asarray(cw), G, axis=0)
    data, correctable, errs = gs.golay_sliced_correct_planes(
        w, G, full_errors=True
    )
    got_data = _bits_of_rows(data, G, 12)
    np.testing.assert_array_equal(got_data, want_data)

    corr_rows = _bits_of_rows(np.asarray(correctable)[None].repeat(1, 0), G, 1)
    np.testing.assert_array_equal(corr_rows != 0, want_cnt < 4)

    # error-bit planes reproduce the per-lane error_count for correctable cws
    e_data, e_par = errs
    ebits = _bits_of_rows(
        np.concatenate([np.asarray(e_data), np.asarray(e_par)]), G, 24
    )
    cnt = np.array(
        [[bin(x).count("1") for x in row] for row in ebits], dtype=np.int32
    )
    ok = want_cnt < 4
    np.testing.assert_array_equal(cnt[ok], want_cnt[ok])


def test_exhaustive_weight_le3_patterns():
    """Every weight<=3 error pattern on a fixed codeword decodes exactly."""
    import itertools

    G = 2  # 64 rows per column; spread patterns over columns
    pats = [0]
    pats += [1 << i for i in range(24)]
    pats += [(1 << i) | (1 << j) for i, j in itertools.combinations(range(24), 2)]
    pats += [
        (1 << i) | (1 << j) | (1 << k)
        for i, j, k in itertools.combinations(range(24), 3)
    ]
    rng = np.random.default_rng(3)
    data = rng.integers(0, 4096, len(pats)).astype(np.int32)
    cw = np.asarray(C.golay_encode_i32(jnp.asarray(data), BM)) ^ np.asarray(
        pats, np.int32
    )
    R = 32 * G
    pad = (-len(cw)) % R
    cw = np.concatenate([cw, np.zeros(pad, np.int32)])
    cols = cw.reshape(-1, R).T  # [R, n_cols]
    w = gs.golay_slice_pack(jnp.asarray(cols), G, axis=0)
    dec, correctable, _ = gs.golay_sliced_correct_planes(w, G)
    got = _bits_of_rows(dec, G, 12).T.reshape(-1)[: len(pats)]
    np.testing.assert_array_equal(got, data)
    corr = _bits_of_rows(np.asarray(correctable)[None], G, 1).T.reshape(-1)[
        : len(pats)
    ]
    assert (corr != 0).all()


def test_nibble_words_identity_order():
    """bitcast(int8) row r of sliced_nibble_words output == nibble t of
    codeword row r (simulated bitcast: byte k of word u -> row 4u+k)."""
    rng = np.random.default_rng(11)
    G, bs = 12, 32
    data = rng.integers(0, 4096, (32 * G, bs)).astype(np.int32)
    cw = np.asarray(C.golay_encode_i32(jnp.asarray(data), BM))
    w = gs.golay_slice_pack(jnp.asarray(cw), G, axis=0)
    dec, _, _ = gs.golay_sliced_correct_planes(w, G)
    words = gs.sliced_nibble_words(dec, G)
    for t in range(3):
        wt = np.asarray(words[t])  # [8G, bs]
        by = np.stack(
            [(wt >> (8 * k)) & 0xFF for k in range(4)], axis=1
        ).reshape(32 * G, bs)
        want = (data >> (4 * t)) & 0xF
        np.testing.assert_array_equal(by, want)


def test_valid_row_masks():
    G = 2
    m = gs.valid_row_masks(G, 48)  # 48 of 64 rows valid
    gi, zi = gs._gz_of_row(G)
    bits = (m[gi] >> zi) & 1
    np.testing.assert_array_equal(bits, (np.arange(64) < 48).astype(np.int32))
