"""Device mesh + sharding helpers (the TPU-native replacement for DDP).

The reference's parallelism is single-node data parallelism via one process
per GPU + NCCL allreduce (/root/reference/src/main.py:80-175, SURVEY.md
section 2.6). TPU-native equivalent: ONE logical program over a 1-D
``Mesh(('data',))``; batches are sharded on the data axis, parameters are
replicated, and XLA inserts the gradient/BN-stat reductions (riding ICI
within a slice, DCN across hosts) — there is no explicit collective code to
write for DP.

Multi-host: call ``jax.distributed.initialize()`` before anything else
(replaces the reference's MASTER_ADDR/PORT process-group rendezvous,
main.py:20-22,83-84); every host runs the same program and feeds its own
shard of the global batch via ``make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the visible devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Place a host-local numpy batch onto the mesh, sharded on axis 0.

    Single-process: a plain device_put with the sharding. Multi-process:
    assembles the global array from per-host shards (each host passes only
    its local slice of the global batch).
    """
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, s)
    return {
        k: jax.make_array_from_process_local_data(s, v) for k, v in batch.items()
    }


def maybe_initialize_distributed(cfg=None) -> None:
    """Initialize the multi-controller runtime when running on a pod slice.

    Safe to call unconditionally: no-ops when single-process or when the
    cluster env vars are absent.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        import os

        if os.environ.get("COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
    except Exception:
        pass


def is_main_process() -> bool:
    """Rank-0 gating for I/O (reference gpu==0 checks, main.py:115 etc.)."""
    return jax.process_index() == 0
