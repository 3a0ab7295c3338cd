"""Fused Pallas TPU kernel for the non-local (deformable-gather) propagation.

EXCISED from ops/pallas/ (round 3; spaceconv precedent).

Negative result, pinned: this kernel compiles + passes parity in
interpret mode and at toy shapes, but on this attachment's Mosaic stack it
is unusable at model shapes — round 2 recorded tpu_compile_helper crashes
at 228x304 / 240x1216 plane shapes for both the ~900-slice unrolled
select-window body and the lane-dim take_along_axis variant, and a round-3
re-probe (/tmp/deform_probe-style, 12x228x304) did not finish compiling
within 9 minutes. The production non-local path is the XLA windowed
shift-and-select form (ops/propagate.propagate_deformable_windowed, 135x
the naive gather, ~850 G elem-op/s, within ~4x of the v5e VPU ceiling) —
a Pallas win here is bounded and not reachable on this stack.

Kept under devtools for a future Mosaic stack; original module docstring
follows.

Replaces the reference's DCNv2 CUDA op in its degenerate NLSPN configuration
(frozen all-ones 1x(1)x3x3 weight, zero bias — nlspnmodel.py:107-121,204-208,
i.e. an affinity-modulated bilinear gather; device kernels
modulated_deform_im2col_cuda.cuh:24-54,127-194).

TPU-native design — windowed (shift-and-select) reformulation:
per-pixel data-dependent gathers are the one primitive a TPU's vector unit
does not have (XLA lowers them to a scalar loop: measured 308 ms for ONE
NYU-b=12 step, docs/PERFORMANCE.md), and Mosaic's in-kernel gather support
is too limited to lean on (lane-dim take_along_axis compiles only for a
narrow shape family on this stack). Instead the bilinear sample is summed
over the static integer window around each neighbor's kernel shift with
tent weights ``hat(t) = max(0, 1-|t|)``:

    out_k(y, x) = sum_{u, v} hat(ty-u) * hat(tx-v) * P(y+u, x+v)

exact whenever every learned offset lies in [-radius, radius]
(ops/propagate.propagate_deformable adds a runtime exact-gather fallback
beyond that). Every term is a static slice of the zero-padded depth plane
held in VMEM — pure VPU work with no HBM re-reads; the horizontal tent
weights are computed once per neighbor and reused across the row window.

The backward recomputes through the identical pure-JAX windowed mirror
(ops/propagate.propagate_deformable_windowed) via jax.custom_vjp:
deterministic (vs the reference's atomicAdd col2im scatter, cuh:196-254),
with the tent-weight derivative reproducing the CUDA coordinate gradients
(mdmcn_get_coordinate_weight, cuh:83-125) under plain autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nlspn_eccv20_tpu.ops.propagate import (
    _neighbor_shifts,
    propagate_deformable_windowed,
)

try:  # pragma: no cover - import guard mirrors local_prop.py
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# VMEM plane budget: padded plane + 2*K2 offset + K2 aff + out + ~12
# temporaries (wxs row cache etc.), all fp32.
_VMEM_BUDGET = 100 * 2**20


def deform_pallas_available() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def deform_kernel_supported(h: int, w: int, kernel: int = 3,
                            radius: int = 4) -> bool:
    """Static check: one batch plane's working set fits the VMEM budget."""
    k2 = kernel * kernel
    rp = radius + 1 + kernel // 2
    planes = 3 * k2 + 14  # off (2K2) + aff (K2) + pad/out/temps
    return planes * (h + 2 * rp) * (w + 2 * rp) * 4 <= _VMEM_BUDGET


def _windowed_kernel(p_ref, off_ref, aff_ref, out_ref, *, kernel: int,
                     radius: int, h: int, w: int, rp: int):
    shifts = _neighbor_shifts(kernel)
    acc = jnp.zeros((h, w), jnp.float32)
    for ki, (dy, dx) in enumerate(shifts):
        ty = off_ref[0, 2 * ki] + dy
        tx = off_ref[0, 2 * ki + 1] + dx
        a = aff_ref[0, ki]
        vs = range(dx - radius, dx + radius + 2)
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(tx - v)) for v in vs]
        neighk = jnp.zeros((h, w), jnp.float32)
        for u in range(dy - radius, dy + radius + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty - u))
            row = jnp.zeros((h, w), jnp.float32)
            for v, wx in zip(vs, wxs):
                row = row + p_ref[0, rp + u:rp + u + h,
                                  rp + v:rp + v + w] * wx
            neighk = neighk + row * wy
        acc = acc + neighk * a
    out_ref[0] = acc


def _deform_pallas_core(feat_p, off_p, aff_p, *, kernel: int, radius: int):
    """feat_p: (B, H, W); off_p: (B, 2*K2, H, W); aff_p: (B, K2, H, W)."""
    b, h, w = feat_p.shape
    k2 = kernel * kernel
    rp = radius + 1 + kernel // 2
    p = jnp.pad(feat_p, ((0, 0), (rp, rp), (rp, rp)))

    kern = functools.partial(_windowed_kernel, kernel=kernel, radius=radius,
                             h=h, w=w, rp=rp)
    bytes_plane = h * w * 4
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2 * rp, w + 2 * rp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * k2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), feat_p.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k2 * (2 * radius + 2) ** 2 * h * w,
            bytes_accessed=b * bytes_plane * (3 * k2 + 2),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(p, off_p, aff_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _deform_op(feat_p, off_p, aff_p, kernel, radius):
    return _deform_pallas_core(feat_p, off_p, aff_p, kernel=kernel,
                               radius=radius)


def _pure_windowed_planar(feat_p, off_p, aff_p, kernel, radius):
    out = propagate_deformable_windowed(
        feat_p[..., None], jnp.moveaxis(off_p, 1, -1),
        jnp.moveaxis(aff_p, 1, -1), kernel=kernel, radius=radius)
    return out[..., 0]


def _deform_op_fwd(feat_p, off_p, aff_p, kernel, radius):
    out = _deform_op(feat_p, off_p, aff_p, kernel, radius)
    return out, (feat_p, off_p, aff_p)


def _deform_op_bwd(kernel, radius, res, g):
    feat_p, off_p, aff_p = res
    _, vjp = jax.vjp(
        functools.partial(_pure_windowed_planar, kernel=kernel,
                          radius=radius),
        feat_p, off_p, aff_p)
    return vjp(g)


_deform_op.defvjp(_deform_op_fwd, _deform_op_bwd)


def propagate_deformable_pallas(feat, offset, aff, kernel: int = 3,
                                radius: int = 4):
    """Drop-in for ops.propagate.propagate_deformable_windowed (NHWC),
    self-partitioned over an ambient data mesh (ops/pallas/shard.py).

    feat: (B, H, W, 1); offset: (B, H, W, 2*K2); aff: (B, H, W, K2).
    Exact iff all offsets lie in [-radius, radius] — callers go through
    ops.propagate.propagate_deformable for the runtime exact fallback.
    """
    from nlspn_eccv20_tpu.ops.pallas.shard import shard_over_data

    def core(f, o, a):
        return _deform_op(f, o, a, kernel, radius)

    out = shard_over_data(
        core,
        (feat[..., 0], jnp.moveaxis(offset, -1, 1),
         jnp.moveaxis(aff, -1, 1)),
        (True, True, True))
    return out[..., None]
