"""Self-partitioning of the Pallas kernels over the ambient data mesh.

Under pjit/GSPMD a Pallas kernel lowers to an opaque custom call the SPMD
partitioner cannot split: with the batch sharded over ``Mesh(('data',))``
(the framework's DP layout, parallel/mesh.py) XLA inserts an **all-gather**
and every device computes the FULL global batch — numerically correct,
but the kernel's work is replicated N-way instead of partitioned
(verified on the compiled HLO; tests/test_pallas_sharding.py pins both
the failure mode and the fix).

Every kernel in this package is batch-parallel — batch is the leading grid
dimension, and the only cross-batch reductions are weight gradients, whose
``psum`` shard_map's transpose inserts automatically for replicated
operands. So the fix is mechanical: when tracing under an ambient data
mesh (``train.Engine`` sets one with ``jax.sharding.set_mesh`` around its
jitted steps), wrap the kernel in ``jax.shard_map`` over the data axis so
each device runs it on its own batch shard.

No ambient mesh (plain single-chip jit, off-mesh traces, unit tests) or an
unusable one (batch not divisible, already inside a shard_map, a
multi-device non-data axis) falls back to the plain call — identical to
the previous behavior.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax.sharding import AxisType, PartitionSpec as P, get_abstract_mesh

from nlspn_eccv20_tpu.parallel.mesh import DATA_AXIS


def ambient_data_mesh(batch: int):
    """The ambient abstract mesh, when sharding ``batch`` over it is valid.

    Valid means: the mesh has a 'data' axis that is multi-device, still
    Auto (Manual would mean we are already inside a shard_map — wrapping
    again would be ill-formed), and divides ``batch``; and every other
    axis is single-device (Pallas ops are config-gated off under spatial
    sharding; any future extra axis needs its own specs, not silence).
    """
    try:
        m = get_abstract_mesh()
    except Exception:  # pragma: no cover - very old jax
        return None
    if m is None or DATA_AXIS not in m.axis_names:
        return None
    i = m.axis_names.index(DATA_AXIS)
    if m.axis_types[i] != AxisType.Auto:
        return None
    n = m.shape[DATA_AXIS]
    if n <= 1 or batch % n != 0:
        return None
    if any(m.shape[a] > 1 for a in m.axis_names if a != DATA_AXIS):
        return None
    return m


def shard_over_data(fn: Callable, args: Sequence, batched: Sequence[bool]):
    """Run ``fn(*args)`` sharded over the ambient data mesh when possible.

    ``batched`` marks, per argument, whether its leading dim is the batch
    (sharded over 'data') or it is replicated (weights/biases/constants).
    The output's leading dim must be the batch. Falls back to a plain
    ``fn(*args)`` call when no valid ambient mesh is found.
    """
    nb = [a.shape[0] for a, b in zip(args, batched) if b]
    m = ambient_data_mesh(nb[0]) if nb else None
    if m is None:
        return fn(*args)
    in_specs = tuple(P(DATA_AXIS) if b else P() for b in batched)
    return jax.shard_map(fn, mesh=m, in_specs=in_specs,
                         out_specs=P(DATA_AXIS), check_vma=False)(*args)
