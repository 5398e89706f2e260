"""Continuous-batching scheduler over the paged ECC KV cache.

vLLM-style serving loop, absent from the reference (it evaluated one text
at a time through a patched HF model; SURVEY.md §2.9). Design:

  * A fixed number of batch SLOTS (static shapes - one compiled decode step
    serves every batch composition). Each active slot owns pages in the
    shared paged cache through the host-side `BlockManager`.
  * Admission runs a single-sequence jitted prefill into the shared cache
    (classic stall-the-decoder continuous batching). Prompts are padded to
    `prefill_bucket` boundaries so at most max_seq_len/prefill_bucket
    distinct prefill shapes ever compile (no compile-storm under real
    traffic); logits are gathered at the true last prompt position and
    context_len excludes the pad tail.
  * One fused decode step advances ALL active slots: per layer, the new
    tokens' K/V are quantized+ECC-encoded(+fault-injected) and written
    in-place by the fused write+attend Pallas kernel.
  * Inactive slots decode against physical block 0, which is reserved as a
    trash page at construction (their block tables are all -1, which the
    kernel clamps to 0), so they never corrupt live sequences.
  * Finished sequences release their pages immediately; the freed pages are
    reused by the next admission (FIFO).

For tensor-parallel serving, build the step functions with
parallel/tp_runtime.make_tp_functions and drive them with the same
slot/page bookkeeping; this single-chip server is the reference loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.block_manager import BlockManager
from ..cache.layout import ECCCacheConfig, allocate_ecc_kv_cache
from ..models.config import ModelConfig
from ..models.kv_policy import KVCachePolicy
from ..models.runtime import FUSED_CODECS, decode_step, prefill


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_ids: np.ndarray  # [S] int
    max_new_tokens: int = 32
    eos_token_id: Optional[int] = None
    temperature: float = 0.0  # 0 = greedy


@dataclasses.dataclass
class RequestOutput:
    request_id: int
    prompt_ids: np.ndarray
    token_ids: List[int]  # generated tokens (excluding prompt)
    finish_reason: str = "length"  # "length" | "eos"


@dataclasses.dataclass
class _SlotState:
    request: Request
    context_len: int  # tokens written to the cache (prompt + generated)
    generated: List[int]
    next_token: int  # sampled but not yet written/decoded


class ContinuousBatchingServer:
    """Admit/decode/retire loop over a shared paged ECC cache."""

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        policy: KVCachePolicy,
        *,
        max_batch: int = 8,
        max_seq_len: int = 2048,
        num_blocks: Optional[int] = None,
        block_size: int = 128,
        prefill_bucket: int = 128,
        collect_ecc_stats: bool = True,
    ):
        if policy.codec not in FUSED_CODECS:
            raise NotImplementedError(
                f"serving requires a fused codec {FUSED_CODECS}, got "
                f"'{policy.codec}'"
            )
        self.params = params
        self.cfg = cfg
        self.policy = policy
        self.max_batch = max_batch
        self.block_size = block_size
        # per-attend correction/detection observability (the reference's
        # get_ecc_stats always counted, ecc_shim.py:1627); costs extra
        # decode work for golay - disable for pure-throughput serving
        self.collect_ecc_stats = collect_ecc_stats
        self._ecc_corrected = 0
        self._ecc_detected = 0
        # prompts are padded up to a multiple of this before prefill, so at
        # most max_seq_len/prefill_bucket distinct prefill shapes ever
        # compile (unbucketed admission compile-storms under real traffic -
        # one XLA compilation per distinct prompt length)
        self.prefill_bucket = max(1, prefill_bucket)
        self.max_pages_per_seq = -(-max_seq_len // block_size)
        if num_blocks is None:
            num_blocks = max_batch * self.max_pages_per_seq + 1
        cache_cfg = ECCCacheConfig(
            num_blocks=num_blocks,
            block_size=block_size,
            num_layers=cfg.num_layers,
            num_kv_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
            codec=policy.codec,
            max_seqs=max_batch,
        )
        self.cache_cfg = cache_cfg
        self.state = allocate_ecc_kv_cache(cache_cfg)
        self.state["context_len"] = jnp.zeros((max_batch,), jnp.int32)
        # +1 manager row: row 0 owns the trash page, slots are rows 1..B
        self.manager = BlockManager(
            num_blocks, block_size, max_seqs=max_batch + 1
        )
        # physical block 0 is the trash page for inactive slots (their
        # block-table rows are -1, which the kernel clamps to 0)
        self.manager.allocate(seq_id=0, num_tokens=1)
        self._trash_owner = 0  # slot ids are offset by 1 in the manager
        self.slots: List[Optional[_SlotState]] = [None] * max_batch
        self.waiting: List[Request] = []
        self.finished: List[RequestOutput] = []
        self._step_counter = 0
        self._key = jax.random.key(policy.seed)
        self._sample_key = jax.random.key(policy.seed + 1)

        @jax.jit
        def _sample(logits, temps, key):
            greedy = jnp.argmax(logits, axis=-1)
            scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
            sampled = jax.random.categorical(key, scaled, axis=-1)
            return jnp.where(temps > 0, sampled, greedy)

        self._sample = _sample

    # -- step-function hooks (overridden by the TP server) ----------------

    def _run_prefill(self, ids, row, key, logit_pos, true_len):
        self.state["context_len"] = jnp.zeros((ids.shape[0],), jnp.int32)
        logits, self.state = prefill(
            self.params, ids, self.state, row, self.cfg, self.policy, key,
            logit_pos=logit_pos, true_len=true_len,
        )
        return logits

    def _run_decode(self, tokens, block_table, key):
        self.state["context_len"] = jnp.asarray(self._context_lens())
        self.state.pop("ecc_corrected", None)
        self.state.pop("ecc_detected", None)
        logits, self.state = decode_step(
            self.params, tokens, self.state, block_table, self.cfg,
            self.policy, key, block_size=self.block_size,
            collect_ecc_stats=self.collect_ecc_stats,
        )
        self._harvest_ecc()
        return logits

    def _harvest_ecc(self):
        """Accumulate and POP the decode step's counter keys (not get:
        leaving them in the state dict changes its pytree structure and
        forces a spurious prefill recompile at the next admission - every
        jitted step keys on the state treedef)."""
        if self.collect_ecc_stats:
            self._ecc_corrected += int(
                jnp.sum(self.state.pop("ecc_corrected", 0))
            )
            self._ecc_detected += int(
                jnp.sum(self.state.pop("ecc_detected", 0))
            )

    @property
    def ecc_stats(self) -> dict:
        """Cumulative decode-phase ECC counters across all served steps
        (reference get_ecc_stats, ecc_shim.py:1627-1642)."""
        return {
            "errors_corrected": self._ecc_corrected,
            "errors_detected": self._ecc_detected,
        }

    # -- host-side bookkeeping -------------------------------------------

    def _mgr_id(self, slot: int) -> int:
        return slot + 1  # manager seq 0 is the trash page owner

    def _block_table(self) -> jnp.ndarray:
        """[max_batch, max_pages_per_seq] int32, -1 for unallocated."""
        full = self.manager.block_table(self.max_pages_per_seq)
        # manager rows are offset by one (trash owner at row 0)
        return full[1 : self.max_batch + 1]

    def _context_lens(self) -> np.ndarray:
        lens = np.zeros(self.max_batch, np.int32)
        for s, st in enumerate(self.slots):
            if st is not None:
                lens[s] = st.context_len
        return lens

    @property
    def num_active(self) -> int:
        return sum(st is not None for st in self.slots)

    @property
    def has_work(self) -> bool:
        return self.num_active > 0 or len(self.waiting) > 0

    def add_request(self, request: Request):
        total = len(request.prompt_ids) + request.max_new_tokens
        if total > self.max_pages_per_seq * self.block_size:
            raise ValueError(
                f"request {request.request_id} needs {total} tokens > "
                f"max_seq_len {self.max_pages_per_seq * self.block_size}"
            )
        pages = -(-total // self.block_size)
        if pages > self.manager.num_blocks - 1:  # block 0 is the trash page
            raise ValueError(
                f"request {request.request_id} needs {pages} pages > "
                f"{self.manager.num_blocks - 1} allocatable blocks"
            )
        self.waiting.append(request)

    # -- admission (prefill) ---------------------------------------------

    def _try_admit(self):
        for slot in range(self.max_batch):
            if not self.waiting or self.slots[slot] is not None:
                continue
            req = self.waiting[0]
            S = int(len(req.prompt_ids))
            # reserve the FULL lifetime (prompt + generation) up front so
            # decode-time growth can never run out of blocks mid-serve
            # pad the prompt to a bucket boundary: bounded prefill compiles.
            # The pad tail's K/V is written but (a) causally invisible to
            # real tokens during prefill and (b) overwritten slot-by-slot by
            # decode before the context mask ever reaches it.
            S_pad = -(-max(S, 1) // self.prefill_bucket) * self.prefill_bucket
            S_pad = min(S_pad, self.max_pages_per_seq * self.block_size)
            total = min(
                max(S + req.max_new_tokens, S_pad),
                self.max_pages_per_seq * self.block_size,
            )
            pages = -(-total // self.block_size)
            if pages > self.manager.num_free_blocks:
                break  # no memory; retry after something finishes
            self.waiting.pop(0)
            padded = np.zeros(S_pad, np.int32)
            padded[:S] = req.prompt_ids
            self.manager.allocate(self._mgr_id(slot), total)
            row = self._block_table()[slot : slot + 1]
            ids = jnp.asarray(padded, jnp.int32)[None, :]
            # single-sequence prefill into the SHARED cache arrays (the
            # row's pages are disjoint from every other slot's)
            logits = self._run_prefill(
                ids, row,
                jax.random.fold_in(self._key, 7_000_000 + req.request_id),
                jnp.asarray([S - 1], jnp.int32),
                jnp.asarray([S], jnp.int32),
            )
            next_tok = int(self._pick_tokens(logits, {0: req})[0])
            self.slots[slot] = _SlotState(
                request=req, context_len=S, generated=[], next_token=next_tok,
            )
            self._note_token(slot, next_tok)

    def _pick_tokens(self, logits, requests_by_row):
        """Device-side sampling: per-row temperature (0 = greedy)."""
        temps = np.zeros(logits.shape[0], np.float32)
        for row, req in requests_by_row.items():
            temps[row] = req.temperature
        self._sample_key, sub = jax.random.split(self._sample_key)
        return np.asarray(
            self._sample(logits, jnp.asarray(temps), sub)
        )

    def _note_token(self, slot: int, token: int):
        st = self.slots[slot]
        st.generated.append(token)
        done_len = len(st.generated) >= st.request.max_new_tokens
        done_eos = (
            st.request.eos_token_id is not None
            and token == st.request.eos_token_id
        )
        if done_len or done_eos:
            self.finished.append(
                RequestOutput(
                    request_id=st.request.request_id,
                    prompt_ids=st.request.prompt_ids,
                    token_ids=list(st.generated),
                    finish_reason="eos" if done_eos else "length",
                )
            )
            self.manager.free_seq(self._mgr_id(slot))
            self.slots[slot] = None

    # -- decode ------------------------------------------------------------

    def step(self) -> List[RequestOutput]:
        """Admit waiting requests, run ONE fused decode step for all active
        slots, and return newly finished requests."""
        already_done = len(self.finished)
        self._try_admit()
        if self.num_active:
            tokens = np.zeros(self.max_batch, np.int64)
            for s, st in enumerate(self.slots):
                if st is not None:
                    tokens[s] = st.next_token
            logits = self._run_decode(
                jnp.asarray(tokens),
                self._block_table(),
                jax.random.fold_in(self._key, self._step_counter),
            )
            self._step_counter += 1
            next_tokens = self._pick_tokens(
                logits,
                {
                    i: st.request
                    for i, st in enumerate(self.slots)
                    if st is not None
                },
            )
            for s in range(self.max_batch):
                st = self.slots[s]
                if st is None:
                    continue
                st.context_len += 1
                st.next_token = int(next_tokens[s])
                self._note_token(s, st.next_token)
        new = self.finished[already_done:]
        return new

    def run(self) -> List[RequestOutput]:
        """Drain all queued work; returns every finished request."""
        while self.has_work:
            self.step()
        return self.finished
