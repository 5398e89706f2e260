"""Device mesh construction and multi-host initialization.

The reference has no distributed support at all (SURVEY.md §2.9); this module
is new TPU-native infrastructure: a named ("data", "model") mesh over ICI,
with DCN handled by jax.distributed for multi-host pods.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int | None = None, model: int | None = None, devices=None) -> Mesh:
    """Build a (data, model) mesh.

    Defaults: model = all devices, data = 1. With both given, data*model must
    equal the device count. Axis order is (data, model) so the model axis
    maps to the innermost (fastest, ICI-contiguous) device dimension.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and model is None:
        data, model = 1, n
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def single_device_mesh() -> Mesh:
    return create_mesh(1, 1, devices=jax.devices()[:1])


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host bring-up (jax.distributed over DCN). No-op when the
    environment provides auto-bootstrap (GKE/TPU-VM metadata)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return jax.process_count(), jax.process_index()


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
