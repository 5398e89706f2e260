"""Tensor-parallel continuous-batching server.

Drives the shard_map'ed TP step functions (parallel/tp_runtime.py) with the
single-chip server's slot/page bookkeeping: the paged ECC cache is sharded
on its kv-head axis over the "model" mesh axis, batch slots over "data".
Per decode step exactly two psums per layer ride the ICI; the fused
dequant+ECC-decode attention kernel runs purely locally on each shard.

New infrastructure with no reference counterpart (the reference is strictly
single-GPU, SURVEY.md §2.9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.kv_policy import KVCachePolicy
from ..parallel.sharding import cache_specs, shard_params
from ..parallel.tp_runtime import make_tp_functions
from .scheduler import ContinuousBatchingServer


class TPContinuousBatchingServer(ContinuousBatchingServer):
    """Continuous batching over a (data, model) mesh.

    Requirements: llama-family model; num_heads/num_kv_heads divisible by
    the model-axis size; max_batch divisible by the data-axis size.
    Admission prefills `data` sequences' rows at a time (waiting slots are
    padded with trash-page rows), so the prefill batch shape is static.
    """

    def __init__(self, params, cfg: ModelConfig, policy: KVCachePolicy,
                 mesh: Mesh, **kw):
        self.mesh = mesh
        self.dp = mesh.shape["data"]
        self.tp = mesh.shape["model"]
        self._tp_params = shard_params(params, cfg, mesh)
        super().__init__(params, cfg, policy, **kw)
        assert self.max_batch % self.dp == 0, (
            f"max_batch {self.max_batch} must be divisible by the data-axis "
            f"size {self.dp}"
        )
        # per-step ECC counters ride the TP decode step: in-kernel local
        # counts, one psum over "model" per step (tp_runtime.make_tp_
        # functions); with the full-draw + head-slice injection streams
        # the totals are bit-identical to the single-chip server's
        self._init, self._tp_prefill, self._tp_decode = make_tp_functions(
            cfg, policy, mesh, block_size=self.block_size,
            collect_ecc_stats=self.collect_ecc_stats,
        )
        # shard the cache state onto the mesh (kv-heads over "model")
        specs = cache_specs()
        self.state = {
            k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in self.state.items()
        }

    def _run_prefill(self, ids, row, key, logit_pos, true_len):
        # pad the single admitted sequence to a full data-axis batch; the
        # padding rows write into the trash page (physical block 0) and
        # their logits are discarded
        B = ids.shape[0]
        ids_p = jnp.concatenate(
            [ids] + [jnp.zeros_like(ids)] * (self.dp - B), axis=0
        )
        rows_p = jnp.concatenate(
            [jnp.maximum(row, 0)]
            + [jnp.zeros_like(row)] * (self.dp - B),
            axis=0,
        )
        lp = jnp.concatenate(
            [logit_pos, jnp.zeros((self.dp - B,), jnp.int32)]
        )
        tl = jnp.concatenate(
            [true_len, jnp.zeros((self.dp - B,), jnp.int32)]
        )
        self.state["context_len"] = jnp.zeros((self.dp,), jnp.int32)
        logits, self.state = self._tp_prefill(
            self._tp_params, ids_p, self.state, rows_p, key, lp, tl
        )
        return logits[:B]

    def _run_decode(self, tokens, block_table, key):
        self.state["context_len"] = jnp.asarray(self._context_lens())
        # the decode step re-emits the counter keys; they must not be inputs
        # (the shard_map in_specs match the counter-free state treedef)
        self.state.pop("ecc_corrected", None)
        self.state.pop("ecc_detected", None)
        # TP decode uses the fused write+attend kernel, which clamps -1
        # block-table entries to the trash page itself
        logits, self.state = self._tp_decode(
            self._tp_params, tokens, self.state, block_table, key
        )
        self._harvest_ecc()
        return logits


class MultihostTPContinuousBatchingServer(TPContinuousBatchingServer):
    """Continuous batching across HOSTS (multi-controller SPMD).

    Every process runs the IDENTICAL server loop (same request stream, same
    host-side scheduler decisions) over a global ("data", "model") mesh whose
    data axis spans the hosts (parallel/multihost.py). Jitted prefill/decode
    steps execute collectively; the only cross-host synchronization beyond
    XLA's own collectives is one `process_allgather` of the sampled token
    vector per step, which keeps the host-side bookkeeping (admission,
    finish detection, page recycling) bit-identical on every process.

    Two hazards of the single-process loop are removed here:
      * `_run_prefill` returns the FULL data-axis logits row block instead of
        slicing row 0 - a row slice of a data-sharded array is not
        addressable from processes that don't hold that shard.
      * `_pick_tokens` never converts a sharded array with np.asarray; it
        samples on device and allgathers the small [batch] token vector.

    No reference counterpart (the reference is single-GPU, SURVEY.md §2.9);
    this is the "continuous batching across hosts" north-star item.
    """

    def _run_prefill(self, ids, row, key, logit_pos, true_len):
        # same admission prefill as the TP server, EXCEPT the result is the
        # full [data, vocab] logits block - no row slice (the caller only
        # reads row 0, which _pick_tokens' allgather makes identical on
        # every process)
        B = ids.shape[0]
        ids_p = jnp.concatenate(
            [ids] + [jnp.zeros_like(ids)] * (self.dp - B), axis=0
        )
        rows_p = jnp.concatenate(
            [jnp.maximum(row, 0)] + [jnp.zeros_like(row)] * (self.dp - B),
            axis=0,
        )
        lp = jnp.concatenate([logit_pos, jnp.zeros((self.dp - B,), jnp.int32)])
        tl = jnp.concatenate([true_len, jnp.zeros((self.dp - B,), jnp.int32)])
        self.state["context_len"] = jnp.zeros((self.dp,), jnp.int32)
        logits, self.state = self._tp_prefill(
            self._tp_params, ids_p, self.state, rows_p, key, lp, tl
        )
        return logits

    def _pick_tokens(self, logits, requests_by_row):
        from jax.experimental import multihost_utils

        temps = np.zeros(logits.shape[0], np.float32)
        for r, req in requests_by_row.items():
            temps[r] = req.temperature
        self._sample_key, sub = jax.random.split(self._sample_key)
        sampled = self._sample(logits, jnp.asarray(temps), sub)
        return np.asarray(
            multihost_utils.process_allgather(sampled, tiled=True)
        )
