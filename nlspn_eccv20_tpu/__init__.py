"""NLSPN-TPU: a TPU-native depth-completion framework.

A from-scratch JAX / Flax / Pallas re-design of the capability surface of
the NLSPN ECCV'20 depth-completion system (reference: XJTUXYC/NLSPN_ECCV20):
RGB + sparse depth in, dense depth out, via an encoder-decoder predicting an
initial depth, pixel-wise confidence, (optionally) non-local neighbor offsets
and affinities, followed by K iterations of affinity-weighted spatial
propagation with a ConvGRU-driven affinity refresh.

Design stance (TPU-first, not a port):
  * NHWC layouts, static shapes, bf16-capable compute policy.
  * The propagation inner loop is a fused stencil/gather op with a Pallas
    kernel on the hot path (`ops/`), never an im2col+GEMM translation.
  * Scale-out is `jax.sharding.Mesh` + data-axis sharding with XLA
    collectives (`parallel/`), not NCCL process groups.
  * Checkpointing via Orbax; input pipeline is host-side NumPy + threaded
    prefetch feeding device-sharded batches.
"""

__version__ = "0.1.0"

from nlspn_eccv20_tpu.config import Config  # noqa: F401
