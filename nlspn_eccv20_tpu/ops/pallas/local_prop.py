"""Fused Pallas TPU kernels for fixed-local spatial propagation.

Replaces the reference's shift-and-stack propagation step
(/root/reference/src/model/nlspnmodel.py:210-224) with VMEM-resident stencil
kernels. Two kernels:

  * ``_step_kernel`` — one step: out = sum_k aff_k * shift_k(pred * conf).
    The (replicate-padded, confidence-weighted) depth plane is read from HBM
    once per step and every shifted window is a static VMEM slice — vs. up
    to 9x re-reads for a naive XLA fusion of 9 shifted slices. The cheap
    elementwise blend/clamp around the stencil stays in XLA where it fuses
    with its consumers for free.

  * ``_loop_kernel`` — the WHOLE K-iteration propagation loop when the
    affinity is constant across iterations (``use_GRU=False``, the upstream
    NLSPN default): every plane stays resident in VMEM for all K steps, so
    HBM traffic drops from K * (K2 + 3) planes to (K2 + 4) planes total —
    an ~K x bandwidth win over even a perfectly-fused per-step loop.

Implementation notes (Mosaic constraints, discovered empirically on v5e):
  * dynamic lane-dimension slices must be 128-aligned -> all window slices
    use STATIC offsets selected by ``lax.switch`` on the neighbor index;
  * iota-mask + roll based edge replication blows the VMEM stack frame on
    KITTI-sized planes -> replicate padding is materialized instead (by XLA
    for the per-step kernel; into a VMEM scratch for the loop kernel).

Backward passes reuse the pure-JAX formulation via jax.custom_vjp
(deterministic, unlike the reference CUDA atomicAdd col2im backward —
modulated_deform_im2col_cuda.cuh:249).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from nlspn_eccv20_tpu.ops.propagate import propagate_local, propagate_local_planar

try:  # Pallas import is safe everywhere; kernels need TPU or interpret mode.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_local_prop_available() -> bool:
    """True when the fused kernel can run compiled on the default backend."""
    if not _PALLAS_OK:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    # On non-TPU backends (CPU test meshes) run in interpreter mode so the
    # same code path is exercised everywhere.
    return jax.default_backend() != "tpu"


def _neighbor_shifts(kernel: int):
    r = kernel // 2
    return [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


# ---------------------------------------------------------------------------
# Single-step kernel: out = sum_k aff_k * shift_k(padded_plane)
# ---------------------------------------------------------------------------

def _step_kernel(padded_ref, aff_ref, out_ref, *, kernel: int):
    k = pl.program_id(1)
    h = out_ref.shape[1]
    w = out_ref.shape[2]
    k2 = kernel * kernel

    # Window for neighbor k starts at static (dy, dx) in the padded plane.
    branches = []
    for dy in range(kernel):
        for dx in range(kernel):
            branches.append(
                lambda p, dy=dy, dx=dx: p[dy:dy + h, dx:dx + w])
    contrib = jax.lax.switch(k, branches, padded_ref[0]) * aff_ref[0, 0]

    @pl.when(k == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(k > 0)
    def _acc():
        out_ref[0] = out_ref[0] + contrib


def _stencil_pallas(pred, conf, aff, *, kernel, has_conf):
    """pred/conf: (B, H, W); aff: (B, K2, H, W). Returns (B, H, W)."""
    b, h, w = pred.shape
    k2 = kernel * kernel
    r = kernel // 2

    p = pred * conf if has_conf else pred
    padded = jnp.pad(p, ((0, 0), (r, r), (r, r)), mode="edge")

    pad_spec = pl.BlockSpec((1, h + 2 * r, w + 2 * r), lambda i, k: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, h, w), lambda i, k: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((1, 1, h, w), lambda i, k: (i, k, 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_step_kernel, kernel=kernel)
    bytes_plane = h * w * 4
    return pl.pallas_call(
        kern,
        grid=(b, k2),
        in_specs=[pad_spec, aff_spec],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w), pred.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k2 * h * w,
            bytes_accessed=b * bytes_plane * (k2 + 2),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(padded, aff)


def _pure_stencil(pred, conf, aff_k, *, kernel, has_conf):
    """Pure-JAX mirror of the stencil for the VJP. Planar (B, H, W) layout."""
    p = pred * conf if has_conf else pred
    return propagate_local_planar(p, aff_k, kernel=kernel)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _stencil(pred, conf, aff, kernel, has_conf):
    return _stencil_pallas(pred, conf, aff, kernel=kernel, has_conf=has_conf)


def _stencil_fwd(pred, conf, aff, kernel, has_conf):
    out = _stencil(pred, conf, aff, kernel, has_conf)
    return out, (pred, conf, aff)


def _stencil_bwd(kernel, has_conf, res, g):
    pred, conf, aff = res
    _, vjp = jax.vjp(
        functools.partial(_pure_stencil, kernel=kernel, has_conf=has_conf),
        pred, conf, aff)
    return vjp(g)


_stencil.defvjp(_stencil_fwd, _stencil_bwd)


def _stencil_sharded(pred, conf, aff, kernel, has_conf):
    """_stencil, self-partitioned over an ambient data mesh (see
    ops/pallas/shard.py — GSPMD would otherwise all-gather the batch and
    replicate the custom call on every device)."""
    from nlspn_eccv20_tpu.ops.pallas.shard import shard_over_data

    return shard_over_data(
        lambda p, c, a: _stencil(p, c, a, kernel, has_conf),
        (pred, conf, aff), (True, True, True))


# ---------------------------------------------------------------------------
# Whole-loop kernel (constant affinity, i.e. use_GRU=False)
# ---------------------------------------------------------------------------

def _loop_kernel(pred_ref, conf_ref, dep_ref, aff_ref, out_ref, *,
                 kernel: int, steps: int, halo: int, n_wtiles: int,
                 has_conf: bool, preserve: bool, clip: bool, pre_blend: bool):
    """Full propagation loop for one (batch, W-tile) program, all in VMEM.

    The tile buffer is the output tile plus a ``halo = steps * r`` column
    margin on each side, read from globally halo-padded inputs. Each
    iteration the stencil is applied to the whole buffer with on-the-fly
    replicate padding (value ops — no scratch stores): values within i*r of
    the buffer border are wrong after iteration i, but that contamination
    never reaches the central output columns because halo >= steps*r. At
    TRUE image edges (leftmost/rightmost tile; all rows) replicate padding
    is the reference semantics, and the virtual halo columns are re-pinned
    to the current edge column each iteration via an iota mask.
    """
    t = pl.program_id(1)
    hb = pred_ref.shape[2]           # image height (rows are not tiled)
    wb = pred_ref.shape[3]           # tile width + 2*halo
    r = kernel // 2
    shifts = _neighbor_shifts(kernel)

    conf_t = conf_ref[0, 0] if has_conf else None
    d = dep_ref[0, 0] if (preserve or pre_blend) else None
    m = (d > 0.0).astype(jnp.float32) if d is not None else None

    is_left = t == 0
    is_right = t == n_wtiles - 1
    col = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)
    virt_l = jnp.logical_and(is_left, col < halo)
    virt_r = jnp.logical_and(is_right, col >= wb - halo)

    def pin_edges(x):
        # virtual columns (beyond the true image edge) replicate the current
        # edge column, like the reference's per-step replicate pad.
        x = jnp.where(virt_l, x[:, halo:halo + 1], x)
        return jnp.where(virt_r, x[:, wb - halo - 1:wb - halo], x)

    cur = pred_ref[0, 0]
    if pre_blend:  # reference :342-348 (k == 1 pre-step blend/clip)
        cur = (1.0 - m) * cur + m * d
        if clip:
            cur = jnp.maximum(cur, 0.0)
    cur = pin_edges(cur)

    def body(_, cur):
        p = cur * conf_t if has_conf else cur
        # replicate pad by r with value ops; horizontal border columns are
        # halo/contaminated region, so their padding values are irrelevant
        # for interior tiles and exactly right for edge tiles.
        p = jnp.concatenate([p[:1]] * r + [p] + [p[-1:]] * r, axis=0)
        p = jnp.concatenate([p[:, :1]] * r + [p] + [p[:, -1:]] * r, axis=1)
        acc = jnp.zeros((hb, wb), dtype=jnp.float32)
        for idx, (dy, dx) in enumerate(shifts):
            acc = acc + aff_ref[0, 0, idx] * p[dy + r:dy + r + hb,
                                               dx + r:dx + r + wb]
        if preserve:
            acc = (1.0 - m) * acc + m * d
        if clip:
            acc = jnp.maximum(acc, 0.0)
        return pin_edges(acc)

    # Mosaic's for-loop lowering supports only unroll=1 or full unroll.
    final = jax.lax.fori_loop(0, steps, body, cur,
                              unroll=steps if steps <= 16 else 1)
    out_ref[0] = final[:, halo:wb - halo]


def _pick_wtiles(h: int, w: int, k2: int, halo: int,
                 vmem_budget: int = 48 * 2**20) -> Optional[int]:
    """Smallest W-tile count whose buffers fit the VMEM budget.

    Tiles beyond n=1 must have 128-aligned width (Mosaic requires block
    dims divisible by (8, 128) unless equal to the array dims). Returns
    None when no admissible tiling fits — caller falls back to the
    per-step path. The default budget leaves headroom below the ~128 MB
    v5e VMEM for the loop body's temporaries.
    """
    for n in range(1, w + 1):
        if w % n != 0:
            continue
        tw = w // n
        if n > 1 and tw % 128 != 0:
            continue
        wb = tw + 2 * halo
        # carried planes: pred/conf/dep/out + k2 affinity + ~3 temporaries
        if (k2 + 7) * h * wb * 4 <= vmem_budget:
            return n
    return None


def _propagate_loop_core(pred, aff, conf=None, dep=None, *, steps: int,
                         kernel: int = 3, preserve: bool = False,
                         clip: bool = False, pre_blend: bool = False,
                         vmem_budget: int = 48 * 2**20):
    """Full K-step propagation loop with constant affinity, fused in VMEM.

    pred/conf/dep: (B, H, W, 1); aff: (B, H, W, K2). Returns (B, H, W, 1)
    final prediction. HBM sees each plane once (plus the halo overlap) for
    the WHOLE loop instead of once per step. Forward-only
    (inference/benchmark path); training with use_GRU=False still uses
    per-step kernels under scan for pred_inter and the VJP.
    """
    b, h, w, _ = pred.shape
    k2 = kernel * kernel
    r = kernel // 2
    halo = steps * r
    has_conf = conf is not None

    n_wtiles = _pick_wtiles(h, w, k2, halo, vmem_budget)
    if n_wtiles is None:
        raise ValueError(
            f"no VMEM-admissible W-tiling for ({h}, {w}) with halo {halo}")
    tw = w // n_wtiles
    wb = tw + 2 * halo

    pad = ((0, 0), (0, 0), (halo, halo))
    p = jnp.pad(pred[..., 0], pad, mode="edge")
    c = jnp.pad(conf[..., 0], pad, mode="edge") if has_conf else p
    d = jnp.pad(dep[..., 0], pad) if dep is not None else p  # zeros: no
    # preservation beyond the image edge (virtual cols are re-pinned anyway)
    aff_k = jnp.pad(jnp.moveaxis(aff, -1, 1),
                    ((0, 0), (0, 0), (0, 0), (halo, halo)), mode="edge")

    if n_wtiles > 1:
        # Overlapping windows have stride tw != block width wb, which blocked
        # BlockSpecs can't express; materialize the tiles with one XLA gather
        # (a few halo columns of extra HBM traffic, amortized over K steps).
        def tiles(x):
            return jnp.stack([x[..., t * tw:t * tw + wb]
                              for t in range(n_wtiles)], axis=1)

        p, c, d, aff_k = tiles(p), tiles(c), tiles(d), tiles(aff_k)
    else:
        p, c, d, aff_k = (x[:, None] for x in (p, c, d, aff_k))

    kern = functools.partial(
        _loop_kernel, kernel=kernel, steps=steps, halo=halo,
        n_wtiles=n_wtiles, has_conf=has_conf, preserve=preserve, clip=clip,
        pre_blend=pre_blend)

    plane_spec = pl.BlockSpec((1, 1, h, wb), lambda i, t: (i, t, 0, 0),
                              memory_space=pltpu.VMEM)
    bytes_plane = h * w * 4
    out = pl.pallas_call(
        kern,
        grid=(b, n_wtiles),
        in_specs=[plane_spec, plane_spec, plane_spec,
                  pl.BlockSpec((1, 1, k2, h, wb), lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, tw), lambda i, t: (i, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), pred.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * steps * k2 * h * w,
            bytes_accessed=b * bytes_plane * (k2 + 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(p, c, d, aff_k)
    return out[..., None]


def loop_kernel_supported(h: int, w: int, steps: int, kernel: int = 3,
                          vmem_budget: int = 48 * 2**20) -> bool:
    """Static check: does a VMEM-admissible W-tiling exist for this shape?"""
    k2 = kernel * kernel
    halo = steps * (kernel // 2)
    return _pick_wtiles(h, w, k2, halo, vmem_budget) is not None


def loop_kernel_profitable(b: int, h: int, w: int) -> bool:
    """Measured v5e profitability boundary of the STANDALONE whole-loop
    kernel vs XLA's fused per-step loop (r03 calibration, 12-step fp32
    loop, device time — table in docs/PERFORMANCE.md). Guidance for
    op-level callers; NOTE the model's 'auto' does NOT use this — inside
    the full model the custom call's layout pin costs more than the loop
    saves (see models/nlspn._use_loop_kernel and PERFORMANCE.md):

        1x228x304   xla 165us  loop  36us   4.6x   <- wins
        1x240x1216  xla 425us  loop  97us   4.4x   <- wins
        1x480x640   xla 417us  loop 121us   3.5x   <- wins
        1x120x160   xla  10us  loop  15us   0.69x  <- loses (tiny plane)
        2x228x304   xla  55us  loop  69us   0.79x  <- loses
        4..12 x any xla wins 0.74-0.84x            <- loses

    The kernel wins exactly at per-call batch 1 on non-tiny planes, where
    XLA's per-step fused loop falls into a degenerate b=1 layout; at b>=2
    XLA's loop is strictly faster. The plane-size threshold (2^16 px) puts
    228x304 (69k px, wins 4.6x) in and 120x160 (19k px, loses) out."""
    return b == 1 and h * w >= 65536


def _pure_loop_planar(pred, aff, conf, dep, *, steps: int, kernel: int,
                      preserve: bool, clip: bool, pre_blend: bool,
                      has_conf: bool, has_dep: bool):
    """Pure-JAX mirror of the whole-loop kernel (reference loop semantics,
    nlspnmodel.py:340-361 with constant affinity). Used for the VJP and as
    the parity oracle. pred/conf/dep: (B, H, W); aff: (B, K2, H, W)."""
    cur = pred
    m = None
    if has_dep and (preserve or pre_blend):
        m = (dep > 0.0).astype(pred.dtype)
    if pre_blend:
        cur = (1.0 - m) * cur + m * dep
        if clip:
            cur = jnp.maximum(cur, 0.0)
    for _ in range(steps):
        p = cur * conf if has_conf else cur
        out = propagate_local_planar(p, aff, kernel=kernel)
        if preserve and m is not None:
            out = (1.0 - m) * out + m * dep
        if clip:
            out = jnp.maximum(out, 0.0)
        cur = out
    return cur


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _loop_op(pred, aff, conf, dep, steps, kernel, preserve, clip, pre_blend,
             has_conf, has_dep, vmem_budget):
    """Differentiable whole-loop op, planar layout. conf/dep are always
    passed (dummies = pred when has_conf/has_dep are False) so the custom
    VJP has a fixed arity; the dummies are never read and get zero grads."""
    c = conf[..., None] if has_conf else None
    d = dep[..., None] if has_dep else None
    out = _propagate_loop_core(
        pred[..., None], jnp.moveaxis(aff, 1, -1), conf=c, dep=d,
        steps=steps, kernel=kernel, preserve=preserve, clip=clip,
        pre_blend=pre_blend, vmem_budget=vmem_budget)
    return out[..., 0]


def _loop_op_fwd(pred, aff, conf, dep, steps, kernel, preserve, clip,
                 pre_blend, has_conf, has_dep, vmem_budget):
    out = _loop_op(pred, aff, conf, dep, steps, kernel, preserve, clip,
                   pre_blend, has_conf, has_dep, vmem_budget)
    return out, (pred, aff, conf, dep)


def _loop_op_bwd(steps, kernel, preserve, clip, pre_blend, has_conf, has_dep,
                 vmem_budget, res, g):
    pred, aff, conf, dep = res
    _, vjp = jax.vjp(
        functools.partial(
            _pure_loop_planar, steps=steps, kernel=kernel, preserve=preserve,
            clip=clip, pre_blend=pre_blend, has_conf=has_conf,
            has_dep=has_dep),
        pred, aff, conf, dep)
    return vjp(g)


_loop_op.defvjp(_loop_op_fwd, _loop_op_bwd)


def propagate_loop_pallas_planar(pred, aff, conf=None, dep=None, *,
                                 steps: int, kernel: int = 3,
                                 preserve: bool = False, clip: bool = False,
                                 pre_blend: bool = False,
                                 vmem_budget: int = 48 * 2**20):
    """Differentiable whole-loop kernel in planar layout, self-partitioned
    over an ambient data mesh (ops/pallas/shard.py).

    pred/conf/dep: (B, H, W); aff: (B, K2, H, W). Returns (B, H, W).
    Forward runs the fused VMEM-resident Pallas loop; backward recomputes
    through the pure-JAX mirror (deterministic, exact loop semantics).
    """
    from nlspn_eccv20_tpu.ops.pallas.shard import shard_over_data

    if os.environ.get("NLSPN_LOOP_LAYOUT_FIREWALL"):
        # r04 layout experiment (VERDICT r3 item 9): the custom call pins
        # row-major layouts on its operands and XLA layout assignment
        # propagates that upstream into the heads/decoder convs (the
        # 0.39-0.44x in-model loss, models/nlspn.py call-site note). A
        # REAL transpose pair with an optimization_barrier between the
        # halves is not a bitcast and cannot be pattern-cancelled, so
        # layout assignment can fold the layout change into the
        # transposes instead of repropagating. Result recorded in
        # docs/PERFORMANCE.md either way.
        def _fw(x):
            if x is None:
                return None
            y = jax.lax.optimization_barrier(jnp.swapaxes(x, -1, -2))
            return jnp.swapaxes(y, -1, -2)

        pred, aff = _fw(pred), _fw(aff)
        conf, dep = _fw(conf), _fw(dep)

    has_conf = conf is not None
    has_dep = dep is not None
    if (preserve or pre_blend) and not has_dep:
        # Without this the Pallas forward would blend against the `pred`
        # dummy while the pure-JAX VJP mirror (guarded on has_dep) skips
        # the blend — wrong output AND a fwd/bwd inconsistency (ADVICE r2).
        raise ValueError("preserve/pre_blend require dep to be passed")
    c = conf if has_conf else pred
    d = dep if has_dep else pred

    def core(p, a, c_, d_):
        return _loop_op(p, a, c_, d_, steps, kernel, preserve, clip,
                        pre_blend, has_conf, has_dep, vmem_budget)

    return shard_over_data(core, (pred, aff, c, d), (True,) * 4)


def propagate_loop_pallas(pred, aff, conf=None, dep=None, *, steps: int,
                          kernel: int = 3, preserve: bool = False,
                          clip: bool = False, pre_blend: bool = False,
                          vmem_budget: int = 48 * 2**20):
    """NHWC wrapper over propagate_loop_pallas_planar.

    pred/conf/dep: (B, H, W, 1); aff: (B, H, W, K2). Returns (B, H, W, 1).
    """
    out = propagate_loop_pallas_planar(
        pred[..., 0], jnp.moveaxis(aff, -1, 1),
        conf=conf[..., 0] if conf is not None else None,
        dep=dep[..., 0] if dep is not None else None,
        steps=steps, kernel=kernel, preserve=preserve, clip=clip,
        pre_blend=pre_blend, vmem_budget=vmem_budget)
    return out[..., None]


# ---------------------------------------------------------------------------
# Public per-step API (used by the model)
# ---------------------------------------------------------------------------

def propagate_local_pallas(feat: jnp.ndarray, aff: jnp.ndarray,
                           kernel: int = 3) -> jnp.ndarray:
    """Drop-in for ops.propagate.propagate_local.

    feat: (B, H, W, 1); aff: (B, H, W, K2). Returns (B, H, W, 1).
    """
    pred = feat[..., 0]
    aff_k_last = jnp.moveaxis(aff, -1, 1)
    out = _stencil_sharded(pred, pred, aff_k_last, kernel, False)
    return out[..., None]


def fused_prop_step_planar(pred: jnp.ndarray, aff: jnp.ndarray,
                           conf=None, dep=None, *, kernel: int = 3,
                           preserve: bool = False,
                           clip: bool = False) -> jnp.ndarray:
    """One propagation-loop iteration in planar layout.

    pred/conf/dep: (B, H, W); aff: (B, K2, H, W). Returns (B, H, W).
    Pallas stencil + XLA-fused blend/clamp.
    """
    has_conf = conf is not None
    c = conf if has_conf else pred
    out = _stencil_sharded(pred, c, aff, kernel, has_conf)
    if preserve and dep is not None:
        m = (dep > 0.0).astype(out.dtype)
        out = (1.0 - m) * out + m * dep
    if clip:
        out = jnp.maximum(out, 0.0)
    return out


def fused_prop_step(pred: jnp.ndarray, aff: jnp.ndarray,
                    conf=None, dep=None, *, kernel: int = 3,
                    preserve: bool = False, clip: bool = False) -> jnp.ndarray:
    """NHWC wrapper over fused_prop_step_planar.

    pred/conf/dep: (B, H, W, 1); aff: (B, H, W, K2). Returns (B, H, W, 1).
    """
    out = fused_prop_step_planar(
        pred[..., 0], jnp.moveaxis(aff, -1, 1),
        conf=conf[..., 0] if conf is not None else None,
        dep=dep[..., 0] if dep is not None else None,
        kernel=kernel, preserve=preserve, clip=clip)
    return out[..., None]
