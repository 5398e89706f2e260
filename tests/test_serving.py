"""Continuous-batching server tests: staggered admission must reproduce
isolated generation exactly (BER=0), pages must be recycled, and fault
injection must run under protection without derailing decoding."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

# slow tier: excluded from the fast correctness gate (pytest -m 'not slow')
pytestmark = pytest.mark.slow


from qkv_ecc_tpu.models.config import TINY_LLAMA
from qkv_ecc_tpu.models.kv_policy import policy_for_mode
from qkv_ecc_tpu.models.registry import init_params
from qkv_ecc_tpu.models.runtime import generate
from qkv_ecc_tpu.serving import ContinuousBatchingServer, Request


@pytest.fixture(scope="module")
def tiny():
    cfg = dataclasses.replace(TINY_LLAMA, name="serving-tiny")
    params = init_params(cfg, 0)
    return params, cfg


def make_server(params, cfg, mode="int4-hamming84", ber=0.0, **kw):
    policy = policy_for_mode(mode, ber=ber, seed=42)
    kw.setdefault("max_batch", 3)
    kw.setdefault("max_seq_len", 96)
    kw.setdefault("block_size", 16)
    return ContinuousBatchingServer(params, cfg, policy, **kw)


def test_staggered_batching_matches_isolated_generation(tiny, rng):
    """Three requests admitted at different times (forcing mixed batches)
    produce exactly the tokens isolated generate() produces (greedy, BER=0).
    """
    params, cfg = tiny
    prompts = [
        rng.integers(0, cfg.vocab_size, (n,)) for n in (7, 13, 5)
    ]
    policy = policy_for_mode("int4-hamming84", ber=0.0, seed=42)
    expected = []
    for p in prompts:
        out = generate(
            params, jnp.asarray(p)[None, :], cfg, policy,
            max_new_tokens=6, block_size=16,
        )
        expected.append(list(np.asarray(out[0, len(p):])))

    server = make_server(params, cfg)
    server.add_request(Request(0, prompts[0], max_new_tokens=6))
    server.add_request(Request(1, prompts[1], max_new_tokens=6))
    server.step()  # admits both, decodes one step
    server.add_request(Request(2, prompts[2], max_new_tokens=6))
    outs = server.run()
    assert len(outs) == 3
    by_id = {o.request_id: o for o in outs}
    for i in range(3):
        assert by_id[i].token_ids == expected[i], f"request {i} diverged"


def test_pages_recycled_after_finish(tiny, rng):
    params, cfg = tiny
    server = make_server(params, cfg, max_batch=2, max_seq_len=64)
    free0 = server.manager.num_free_blocks
    for i in range(5):
        server.add_request(
            Request(i, rng.integers(0, cfg.vocab_size, (9,)), max_new_tokens=4)
        )
    outs = server.run()
    assert len(outs) == 5
    assert server.manager.num_free_blocks == free0


def test_more_requests_than_slots_all_finish(tiny, rng):
    params, cfg = tiny
    server = make_server(params, cfg, max_batch=2)
    reqs = [
        Request(i, rng.integers(0, cfg.vocab_size, (4 + i,)), max_new_tokens=3)
        for i in range(4)
    ]
    for r in reqs:
        server.add_request(r)
    outs = server.run()
    assert sorted(o.request_id for o in outs) == [0, 1, 2, 3]
    assert all(len(o.token_ids) == 3 for o in outs)


def test_eos_stops_early(tiny, rng):
    params, cfg = tiny
    prompt = rng.integers(0, cfg.vocab_size, (8,))
    policy = policy_for_mode("int4-hamming84", ber=0.0, seed=42)
    ref = generate(
        params, jnp.asarray(prompt)[None, :], cfg, policy,
        max_new_tokens=8, block_size=16,
    )
    second_tok = int(ref[0, 9])  # the 2nd generated token
    server = make_server(params, cfg)
    server.add_request(
        Request(0, prompt, max_new_tokens=8, eos_token_id=second_tok)
    )
    outs = server.run()
    assert outs[0].finish_reason == "eos"
    assert outs[0].token_ids[-1] == second_tok
    assert len(outs[0].token_ids) <= 8


def test_serving_under_fault_injection_golay(tiny, rng):
    """Golay-protected serving at BER 1e-2 completes and returns full-length
    outputs (single-bit errors all corrected inline)."""
    params, cfg = tiny
    server = make_server(params, cfg, mode="int12-golay", ber=1e-2)
    for i in range(3):
        server.add_request(
            Request(i, rng.integers(0, cfg.vocab_size, (6,)), max_new_tokens=5)
        )
    outs = server.run()
    assert len(outs) == 3
    assert all(len(o.token_ids) == 5 for o in outs)


def test_per_request_temperature_sampling(tiny, rng):
    """temperature > 0 samples (deterministic given the server seed) while
    temperature == 0 stays greedy in the same batch."""
    params, cfg = tiny
    policy = policy_for_mode("int4", ber=0.0, seed=42)
    prompts = [rng.integers(0, cfg.vocab_size, (6,)) for _ in range(2)]
    ref = generate(
        params, jnp.asarray(prompts[0])[None, :], cfg, policy,
        max_new_tokens=5, block_size=16,
    )
    greedy_expected = list(np.asarray(ref[0, 6:]))

    server = make_server(params, cfg, mode="int4")
    server.add_request(Request(0, prompts[0], max_new_tokens=5))
    server.add_request(
        Request(1, prompts[1], max_new_tokens=5, temperature=1.5)
    )
    outs = {o.request_id: o for o in server.run()}
    assert outs[0].token_ids == greedy_expected  # greedy row unaffected
    assert len(outs[1].token_ids) == 5

    # same seed -> reproducible sampled tokens
    server2 = make_server(params, cfg, mode="int4")
    server2.add_request(Request(0, prompts[0], max_new_tokens=5))
    server2.add_request(
        Request(1, prompts[1], max_new_tokens=5, temperature=1.5)
    )
    outs2 = {o.request_id: o for o in server2.run()}
    assert outs2[1].token_ids == outs[1].token_ids


def test_oversized_request_rejected(tiny, rng):
    params, cfg = tiny
    server = make_server(params, cfg, max_seq_len=64)
    with pytest.raises(ValueError):
        server.add_request(
            Request(0, rng.integers(0, cfg.vocab_size, (60,)), max_new_tokens=10)
        )
    with pytest.raises(ValueError):
        server.add_request(
            Request(1, rng.integers(0, cfg.vocab_size, (100,)), max_new_tokens=1)
        )


def test_admission_reserves_generation_pages(tiny, rng):
    """Admission reserves prompt+max_new pages up front so decode-time page
    growth can never exhaust the pool mid-serve (two long-running requests
    on a tight pool must serialize, not crash)."""
    params, cfg = tiny
    server = make_server(
        params, cfg, max_batch=2, max_seq_len=48, num_blocks=4, block_size=16
    )
    # each request: 17-token prompt + 15 new = 32 tokens = 2 pages; only 3
    # allocatable blocks -> the second must wait for the first to finish
    for i in range(2):
        server.add_request(
            Request(i, rng.integers(0, cfg.vocab_size, (17,)), max_new_tokens=15)
        )
    outs = server.run()
    assert sorted(o.request_id for o in outs) == [0, 1]
    assert all(len(o.token_ids) == 15 for o in outs)


def test_prefill_bucketing_bounds_compilations(tiny, rng):
    """Randomized prompt lengths must trigger at most
    ceil(max_seq_len/prefill_bucket) distinct prefill compilations
    (VERDICT round-1: unbucketed admission compile-storms)."""
    from qkv_ecc_tpu.models.runtime import prefill

    params, cfg = tiny
    server = make_server(
        params, cfg, max_batch=1, max_seq_len=96, prefill_bucket=32,
        num_blocks=16,
    )
    before = prefill._cache_size()
    lengths = [3, 5, 9, 17, 21, 33, 40, 55, 63, 65]
    for i, n in enumerate(lengths):
        server.add_request(
            Request(i, rng.integers(0, cfg.vocab_size, (n,)), max_new_tokens=2)
        )
    server.run()
    grew = prefill._cache_size() - before
    # lengths bucket to {32, 64, 96} -> at most 3 fresh compilations
    assert grew <= 3, grew


def test_bucketed_prefill_logits_match_exact(tiny, rng):
    """A bucket-padded prefill must produce the same next token and the
    same decoded continuation as exact-length processing (BER=0)."""
    params, cfg = tiny
    policy = policy_for_mode("int4-hamming84", ber=0.0, seed=42)
    p = rng.integers(0, cfg.vocab_size, (11,))
    exact = generate(
        params, jnp.asarray(p)[None, :], cfg, policy, max_new_tokens=5,
        block_size=16,
    )
    server = make_server(params, cfg, prefill_bucket=64, max_seq_len=96)
    server.add_request(Request(0, p, max_new_tokens=5))
    outs = server.run()
    assert outs[0].token_ids == list(np.asarray(exact[0, 11:]))


class TestTPServing:
    """Continuous batching driven by the shard_map'ed TP step functions
    over a multi-device mesh (VERDICT round-1 item #4)."""

    def _mesh(self, data, model):
        import jax
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[: data * model]).reshape(data, model)
        return Mesh(devs, ("data", "model"))

    def _tp_server(self, params, cfg, mesh, **kw):
        from qkv_ecc_tpu.serving import TPContinuousBatchingServer

        policy = policy_for_mode(
            kw.pop("mode", "int4-hamming84"), ber=kw.pop("ber", 0.0), seed=42
        )
        kw.setdefault("max_batch", 4)
        kw.setdefault("max_seq_len", 96)
        kw.setdefault("block_size", 16)
        return TPContinuousBatchingServer(params, cfg, policy, mesh, **kw)

    def test_tp_server_mesh_2x4_end_to_end(self, tiny, rng):
        """The full server loop (staggered admission, mixed batches, page
        recycling) over a data=2 x model=4 mesh. Parity with the
        single-device server is asserted at two levels: (a) post-admission
        cache state and one decode step's logits agree to float tolerance
        (TP reassociates float sums, so exact token equality can flip on
        near-ties), (b) the full served token streams agree on the vast
        majority of tokens."""
        import jax as _jax
        import dataclasses as dc

        params, cfg = tiny
        cfg8 = dc.replace(cfg, num_heads=8, num_kv_heads=4, head_dim=8,
                          name="tp-serve")
        params8 = init_params(cfg8, 3)
        mesh = self._mesh(2, 4)
        prompts = [rng.integers(0, cfg8.vocab_size, (n,)) for n in (7, 13, 5)]

        # (a) step-level parity
        base = make_server(params8, cfg8, max_batch=4)
        server = self._tp_server(params8, cfg8, mesh)
        for srv in (base, server):
            srv.add_request(Request(0, prompts[0], max_new_tokens=6))
            srv.add_request(Request(1, prompts[1], max_new_tokens=6))
            srv._try_admit()
        for k in base.state:
            if k == "context_len":
                continue
            a = np.asarray(base.state[k], np.float64)
            b = np.asarray(server.state[k], np.float64)
            assert np.abs(a - b).max() < 1e-6, k  # int caches exactly equal
        toks = jnp.asarray(
            [base.slots[0].next_token, base.slots[1].next_token, 0, 0]
        )
        key = _jax.random.fold_in(base._key, 0)
        bl = base._run_decode(toks, base._block_table(), key)
        tl = server._run_decode(toks, server._block_table(), key)
        assert np.abs(np.asarray(bl) - np.asarray(tl)).max() < 1e-4

        # (b) full served streams (fresh servers, staggered admission)
        base2 = make_server(params8, cfg8, max_batch=4)
        server2 = self._tp_server(params8, cfg8, mesh)
        for srv in (base2, server2):
            srv.add_request(Request(0, prompts[0], max_new_tokens=6))
            srv.add_request(Request(1, prompts[1], max_new_tokens=6))
            srv.step()
            srv.add_request(Request(2, prompts[2], max_new_tokens=6))
        base_outs = {o.request_id: o.token_ids for o in base2.run()}
        outs = server2.run()
        assert len(outs) == 3
        match = total = 0
        for o in outs:
            assert len(o.token_ids) == 6
            for a, b in zip(o.token_ids, base_outs[o.request_id]):
                match += a == b
                total += 1
        assert match / total > 0.7, (match, total)

    def test_tp_server_with_golay_fault_injection(self, tiny, rng):
        params, cfg = tiny
        import dataclasses as dc

        cfg8 = dc.replace(cfg, num_heads=8, num_kv_heads=4, head_dim=8,
                          name="tp-serve-g")
        params8 = init_params(cfg8, 3)
        mesh = self._mesh(2, 2)
        server = self._tp_server(
            params8, cfg8, mesh, mode="int12-golay", ber=1e-2
        )
        for i in range(3):
            server.add_request(
                Request(i, rng.integers(0, cfg8.vocab_size, (9,)),
                        max_new_tokens=4)
            )
        outs = server.run()
        assert sorted(o.request_id for o in outs) == [0, 1, 2]
        assert all(len(o.token_ids) == 4 for o in outs)

    @pytest.mark.parametrize("mode", ["int4-hamming84", "int12-golay"])
    def test_tp_ecc_counters_match_single_chip(self, tiny, rng, mode):
        """VERDICT round-3 item #6: collect_ecc_stats=True works on the TP
        server, and its counters EQUAL the single-chip server's on the same
        request stream. Exactness holds because (a) the TP injection masks
        are head-slices of the full-shape draw the single-chip runtime makes
        (tp_runtime._shard_masks - same keys, same threefry stream), and
        (b) linear-code error classification depends only on the error
        pattern (syndromes of received = syndromes of the mask), so counter
        parity is immune to sampled-token divergence from TP float
        reassociation."""
        import dataclasses as dc

        params, cfg = tiny
        cfg8 = dc.replace(cfg, num_heads=8, num_kv_heads=4, head_dim=8,
                          name="tp-serve-s")
        params8 = init_params(cfg8, 3)
        mesh = self._mesh(2, 2)
        base = make_server(
            params8, cfg8, mode=mode, ber=2e-2, max_batch=4,
            collect_ecc_stats=True,
        )
        server = self._tp_server(
            params8, cfg8, mesh, mode=mode, ber=2e-2,
            collect_ecc_stats=True,
        )
        prompts = [rng.integers(0, cfg8.vocab_size, (n,)) for n in (9, 14)]
        for srv in (base, server):
            for i, p in enumerate(prompts):
                srv.add_request(Request(i, p, max_new_tokens=5))
            srv.run()
        assert base.ecc_stats["errors_corrected"] > 0
        # exact equality: decode-write masks are identical (global-batch
        # full draw), and prefill writes are scrubbed (zero syndromes in
        # both servers), so every counted syndrome matches bit-for-bit.
        # (Full cache-state equality does NOT hold at BER>0: TP admission
        # pads prefill to a data-axis batch, which changes the prefill
        # mask stream - scrubbing keeps those pages valid but hamming84
        # doubles preserve mask-dependent data.)
        assert base.ecc_stats == server.ecc_stats
