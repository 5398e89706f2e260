"""Data-first split row packing (kernels/swar.py) and the scrub read path's
data-prefix streaming, including the full-row fallback for head dims whose
data prefix is not a multiple of 8 int32 words (a DMA sublane-granularity
hardware constraint; see paged_attention.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qkv_ecc_tpu.kernels import swar
from qkv_ecc_tpu.kernels.paged_attention import (
    paged_attention_ecc,
    paged_attention_ecc_reference,
)
from tests.test_paged_attention import build_cache
from qkv_ecc_tpu.cache.layout import ECCCacheConfig


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize("head_dim", [33, 60, 64, 96, 128])
@pytest.mark.parametrize("codec", ["hamming84", "golay", "hamming74"])
def test_split_pack_roundtrip(codec, head_dim, rng):
    """pack_codewords o unpack_codewords == identity on every stored bit
    (incl. parity and padding values) for the data-first split layouts."""
    pv = swar.padded_values(codec, head_dim)
    n_cw = {"hamming84": pv, "hamming74": pv, "golay": 4 * swar.row_words(
        codec, head_dim) // 3}[codec]
    bits = {"hamming84": 8, "hamming74": 7, "golay": 24}[codec]
    cw = jnp.asarray(
        rng.integers(0, 1 << bits, (3, 5, n_cw)), jnp.int32
    )
    w = swar.pack_codewords(codec, cw, head_dim)
    assert w.shape[-1] == swar.row_words(codec, head_dim)
    back = swar.unpack_codewords(codec, w, head_dim)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(cw))


def test_data_prefix_is_int4_packing(rng):
    """The data-first contract: for every split codec, the first
    data_words() of a packed row are exactly pack_int4 of the data
    nibbles - the scrub read path depends on this bit-for-bit."""
    head_dim = 128
    q = jnp.asarray(rng.integers(0, 16, (4, head_dim)), jnp.int32)
    int4_words = np.asarray(swar.pack_int4(q))
    for codec in ("hamming74", "hamming84", "golay"):
        # round-5 h74 re-layout: EVERY ECC codec's data array is the int4
        # packing (parity alone is codec-specific), so the scrub extract
        # path is literally the int4 read for all of them
        cw = swar.encode_codewords(codec, q, head_dim)
        w = np.asarray(swar.pack_codewords(codec, cw, head_dim))
        dw = swar.data_words(codec, head_dim)
        np.testing.assert_array_equal(w[..., :dw], int4_words, err_msg=codec)
    # hamming74's parity suffix: 3 bit-sliced planes (bit p of value v at
    # plane word p*G + v%G, bit position v//G)
    cw = swar.encode_codewords("hamming74", q, head_dim)
    w = np.asarray(swar.pack_codewords("hamming74", cw, head_dim))
    dw = swar.data_words("hamming74", head_dim)
    G = swar.padded_values("hamming74", head_dim) // 32
    planes = w[..., dw:].reshape(4, 3, G)
    for p in range(3):
        for v in range(head_dim):
            bit = (planes[:, p, v % G] >> (v // G)) & 1
            want = (np.asarray(cw[:, v]) >> (4 + p)) & 1
            np.testing.assert_array_equal(bit, want, err_msg=f"p{p} v{v}")


def test_h84_rebuild_cw_words(rng):
    """h84_rebuild_cw_words inverts the split: byte k of lo/hi holds the
    full 8-bit codeword of value 4*word+k / pv/2 + that."""
    pv = 8
    cw = jnp.asarray(rng.integers(0, 256, (pv,)), jnp.int32)
    w = swar.h84_split_pack(cw)
    half = w.shape[-1] // 2
    lo, hi = swar.h84_rebuild_cw_words(w[..., :half], w[..., half:])
    got = np.concatenate(
        [np.asarray(swar.unpack_bytes4(lo)), np.asarray(swar.unpack_bytes4(hi))]
    )
    np.testing.assert_array_equal(got, np.asarray(cw))


@pytest.mark.parametrize("head_dim", [60, 96, 128])
@pytest.mark.parametrize("codec", ["hamming74", "hamming84", "golay"])
def test_scrub_read_kernel_any_head_dim(codec, head_dim, rng):
    """Scrub-mode reads equal the correcting reference on a scrubbed cache
    across data-array widths: 128 (16-word pages), 96 (12-word), and 60
    (golay's 7-word prefix that does NOT cover every value - extract is
    unavailable, so scrub reads run the correcting path over data+parity)."""
    cfg = ECCCacheConfig(
        num_blocks=8, block_size=16, num_layers=1, num_kv_heads=2,
        head_dim=head_dim, codec=codec,
    )
    cache, block_table, _ = build_cache(
        rng, cfg, batch=2, context_lens=[23, 9], ber=2e-2, seed=5
    )
    # scrub the injected errors (write-path semantics); split layout:
    # rejoin data + parity, scrub, split back
    for name in ("k", "v"):
        full = swar.join_rows(
            codec, cache[f"{name}_cache"], cache[f"{name}_parity"], axis=3
        )
        cw = swar.unpack_codewords(codec, full, head_dim, axis=3)
        scrubbed = swar.pack_codewords(
            codec, swar.scrub_codewords(codec, cw), head_dim, axis=3
        )
        d, p = swar.split_rows(codec, scrubbed, head_dim, axis=3)
        cache[f"{name}_cache"] = jnp.asarray(d)
        cache[f"{name}_parity"] = jnp.asarray(p)
    q = jnp.asarray(rng.normal(size=(2, 4, head_dim)).astype(np.float32))
    ctx = jnp.asarray([23, 9], jnp.int32)
    kw = dict(codec=codec, block_size=16)
    parity = (cache["k_parity"], cache["v_parity"])
    # extract-ok shapes ignore the parity operands; golay head dims whose
    # data prefix does not cover every value (60) require them even under
    # scrub (correcting read path on a scrubbed cache)
    out_scrub = paged_attention_ecc(
        q, cache["k_cache"], cache["v_cache"], cache["k_scales"],
        cache["v_scales"], block_table, ctx, 0, *parity,
        precision="highest", scrub=True, **kw
    )
    out_ref = paged_attention_ecc_reference(
        q, cache["k_cache"], cache["v_cache"], cache["k_scales"],
        cache["v_scales"], block_table, ctx, 0, *parity, **kw
    )
    assert float(jnp.max(jnp.abs(out_scrub - out_ref))) < 1e-4


def test_golay_wide_matches_serial_exhaustively():
    """golay_encode/decode_wide (the candidate-axis-vectorized jnp write-path
    forms) are bit-identical to the per-lane serial IMLD in kernels/common.py
    over ALL weight<=3 error patterns on 64 codewords plus random weight-4/5/6
    patterns, in both zero_uncorrectable modes, including error counts."""
    import itertools

    from qkv_ecc_tpu.kernels.common import golay_decode_i32, golay_encode_i32

    d = jnp.arange(4096, dtype=jnp.int32)
    assert jnp.array_equal(
        swar.golay_encode_wide(d), golay_encode_i32(d, swar._B_MASKS)
    )

    cws = np.asarray(golay_encode_i32(d[:64], swar._B_MASKS))
    pats = [0]
    for w in (1, 2, 3):
        pats += [
            sum(1 << b for b in c)
            for c in itertools.combinations(range(24), w)
        ]
    g = np.random.default_rng(0)
    for w in (4, 5, 6):
        pats += [
            sum(1 << b for b in g.choice(24, w, replace=False))
            for _ in range(200)
        ]
    rx = jnp.asarray(
        (cws[:, None] ^ np.asarray(pats, np.int64)[None, :])
        .astype(np.int32).ravel()
    )
    for zu in (True, False):
        dw, cw = swar.golay_decode_wide(rx, zero_uncorrectable=zu)
        ds, cs = golay_decode_i32(rx, swar._B_MASKS, zero_uncorrectable=zu)
        assert jnp.array_equal(dw, ds)
        assert jnp.array_equal(cw, cs)
