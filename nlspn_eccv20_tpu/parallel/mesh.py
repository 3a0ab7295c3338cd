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

Beyond the reference's DP, the mesh optionally carries a second SPATIAL
axis ('space'): activations are sharded along image WIDTH and XLA's SPMD
partitioner inserts the halo exchanges every convolution/stencil needs at
shard boundaries. This is the natural model-parallel axis for a 2-D CNN
(the survey's "spatial sharding of HxW with halo exchange", SURVEY.md
section 5) and lets one wide KITTI image (240x1216) spread over chips when
per-chip batch 1 is still memory- or latency-bound. There is no sequence
dimension in this model, so sp-over-width plays the role sequence/context
parallelism plays in transformers.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(num_devices: int = 0, devices=None,
              num_spatial: int = 1) -> Mesh:
    """Device mesh: 1-D ('data',) or, with ``num_spatial > 1``, 2-D
    ('data', 'space') — data-parallel replicas x width shards."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[: num_devices * max(num_spatial, 1)]
    devices = np.asarray(devices)
    if num_spatial and num_spatial > 1:
        if devices.size % num_spatial:
            raise ValueError(
                f"{devices.size} devices not divisible by "
                f"num_spatial_shards={num_spatial}")
        return Mesh(devices.reshape(-1, num_spatial),
                    (DATA_AXIS, SPACE_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Sharding for one batch array: batch axis over 'data'; for NHWC
    image tensors (ndim >= 3) the W axis additionally over 'space' when
    the mesh has one. Low-rank arrays (e.g. intrinsics K) shard on batch
    only."""
    if SPACE_AXIS in mesh.axis_names and ndim >= 4:
        # NHWC: shard W (axis 2) over 'space'. Lower-rank arrays (e.g.
        # camera intrinsics) shard on batch only.
        return NamedSharding(mesh, P(DATA_AXIS, None, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Place a host-local numpy batch onto the mesh: batch axis over
    'data', image width additionally over 'space' on a 2-D mesh.

    Single-process: a plain device_put with the sharding. Multi-process:
    assembles the global array from per-host shards (each host passes only
    its local slice of the global batch).
    """
    if jax.process_count() == 1:
        return {
            k: jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
            for k, v in batch.items()
        }
    return {
        k: jax.make_array_from_process_local_data(
            batch_sharding(mesh, np.ndim(v)), v)
        for k, v in batch.items()
    }


def maybe_initialize_distributed(cfg=None) -> None:
    """Initialize the multi-controller runtime when running on a cluster.

    Replaces the reference's MASTER_ADDR/PORT NCCL process-group rendezvous
    (main.py:20-22,83-84). MUST run before anything touches the JAX backend
    (``jax.devices()``/``process_count()`` freeze the runtime in
    single-process mode), so the decision is made purely from environment
    variables:

      * ``JAX_COORDINATOR_ADDRESS`` (+ ``JAX_NUM_PROCESSES`` /
        ``JAX_PROCESS_ID``): explicit rendezvous — works on any backend,
        including multi-process CPU (used by the two-process test).
      * managed-cluster signals JAX auto-detects (TPU pod metadata, SLURM,
        Open MPI): ``jax.distributed.initialize()`` with no arguments.

    Single-process runs (no signals present) are a no-op. Initialization
    failures propagate — a half-initialized cluster must fail loudly, not
    silently train single-host.
    """
    import os

    if jax.distributed.is_initialized():
        return
    env = os.environ
    if env.get("JAX_COORDINATOR_ADDRESS"):
        # explicit rendezvous: jax reads the address env var itself;
        # num_processes/process_id have no standard env, so we accept
        # JAX_NUM_PROCESSES / JAX_PROCESS_ID alongside it.
        num = env.get("JAX_NUM_PROCESSES")
        pid = env.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(num) if num is not None else None,
            process_id=int(pid) if pid is not None else None)
        return
    multi = [
        env.get("SLURM_JOB_NUM_NODES", "1"),
        env.get("OMPI_COMM_WORLD_SIZE", "1"),
        # a pod slice lists several workers; a single-host attachment
        # (e.g. "localhost") is not a cluster
        str(len(env.get("TPU_WORKER_HOSTNAMES", "").split(","))
            if env.get("TPU_WORKER_HOSTNAMES") else 1),
    ]
    if env.get("MEGASCALE_COORDINATOR_ADDRESS") or any(
            s.isdigit() and int(s) > 1 for s in multi):
        jax.distributed.initialize()


def is_main_process() -> bool:
    """Rank-0 gating for I/O (reference gpu==0 checks, main.py:115 etc.)."""
    return jax.process_index() == 0
