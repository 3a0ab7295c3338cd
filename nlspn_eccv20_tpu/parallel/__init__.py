"""Parallelism utilities: device mesh, batch sharding, multi-host init."""

from nlspn_eccv20_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
