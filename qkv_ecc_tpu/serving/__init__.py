"""Serving layer: continuous batching over the paged ECC KV cache.

New TPU-native capability (the reference is a single-request research
harness, SURVEY.md §2.9/§7): a vLLM-style scheduler that admits requests
into batch slots, prefills them into the shared paged cache, decodes all
active sequences in one fused step, and recycles pages on completion.
Tensor-parallel serving over a (data, model) mesh lives in tp_server.py.
"""

from .scheduler import (
    ContinuousBatchingServer,
    Request,
    RequestOutput,
)
from .tp_server import (
    MultihostTPContinuousBatchingServer,
    TPContinuousBatchingServer,
)

__all__ = [
    "ContinuousBatchingServer",
    "TPContinuousBatchingServer",
    "MultihostTPContinuousBatchingServer",
    "Request",
    "RequestOutput",
]
