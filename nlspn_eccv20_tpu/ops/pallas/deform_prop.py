"""Fused Pallas TPU kernels for the non-local (windowed-deformable) propagation.

Replaces the reference's DCNv2 CUDA op in its degenerate NLSPN configuration
(frozen all-ones 1x1xkxk weight, zero bias — nlspnmodel.py:107-121,204-208:
an affinity-modulated bilinear gather; CUDA device kernels
modulated_deform_im2col_cuda.cuh:24-54,127-194 forward and :83-125,196-254
coordinate/input gradients) with the *windowed* shift-accumulate
reformulation of ops/propagate.propagate_deformable_windowed: the bilinear
sample per neighbor is a tent-weighted sum over the static integer window
around that neighbor's kernel shift,

    out_k(y, x) = aff_k * sum_{u, v} hat(ty-u) * hat(tx-v) * P(y+u, x+v)

with ``hat(t) = max(0, 1-|t|)``, (ty, tx) = neighbor shift + learned offset,
and (u, v) walking the per-neighbor window. Exact whenever every offset lies
in [-radius, radius] (the training clamp regime; eval adds a runtime exact
fallback in ops/propagate.propagate_deformable).

TPU-native design, two ideas beyond the (excised) round-2/3 attempt
(devtools/exp_deform_prop_kernel.py, which unrolled all K2*(2R+2)^2 ~= 900
misaligned 2-D slices into one Mosaic program and crashed/hung the
compiler at model shapes):

 1. **Neighbors are a GRID dimension.** grid = (batch, K2); the output
    block revolves in VMEM across the K2 programs, so one program body
    holds only one neighbor's window walk (~8x smaller Mosaic IR).
    Measured r05: compiles in seconds where the single-body kernel hung
    >9 min.

 2. **Vreg-aligned window reads via persistent pre-shifted plane
    caches.** A window slice shifted by v lanes costs a cross-lane
    rotate on the VPU — ~900 of them per step was the dominant cost of
    both the XLA windowed form and the first compiling kernel (measured
    r05: 3471 us vs 2290 us XLA at 12x228x304 R=4). Instead, pre-shifted
    copies of the padded plane are materialized ONCE per batch element
    into VMEM scratch that persists across the K2 grid programs — all
    nv*nv (U, V) combinations when they fit the VMEM stack budget
    (``_full_cache_ok``; ~40 MB at NYU R=4), else the nv lane shifts.
    On full-cache shapes the walk then iterates the RELATIVE window:
    exactly the (2R+2)^2 active terms, no masks, every read a fully
    aligned whole plane selected by a DYNAMIC LEADING index (supported
    by Mosaic; dynamic SUBLANE starts are NOT — they demand provable
    8-alignment). The one-level fallback walks global (U, V) shifts
    with scalar masks and per-read sublane rotates. Measured forward
    progression: 3471 naive -> 2702 one-level -> 2263 masked full-cache
    -> 1920 us relative (XLA: 2290).

The backward is ALSO Pallas (the train step is fwd+bwd and the XLA
backward dominates it: 12.3 ms vs 2.3 ms fwd standalone). On full-cache
shapes it is TWO kernels — a read kernel (daff/doffset over the cache2
relative walk) and a dP SCATTER kernel that needs no plane reads at all
(tent products of off/aff/g accumulated into a (U,V)-indexed scratch,
merged with static offsets in the last program); the split halves the
per-call VMEM stack (the combined form measured 113.5 MB > the cap).
One-level shapes keep a single combined kernel. Standalone fwd+bwd:
9.05 vs 14.6 ms XLA (1.61x). All gradients are deterministic (vs the
reference's atomicAdd col2im scatter, cuh:196-254); the tent-weight
derivative reproduces the CUDA coordinate gradients
(mdmcn_get_coordinate_weight, cuh:83-125) under JAX's subgradient
conventions at the measure-zero ties.

Layouts are planar (minor dims (H, W) tile the 8x128 VPU registers; a
trailing singleton channel would pad 128x in the lane dim — see
ops/propagate.propagate_local_planar's note).
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

# Per-program VMEM working-set budget (see deform_prop_supported). Mosaic's
# default scoped-VMEM stack limit is 16 MB — far below the ~128 MB v5e
# VMEM — and this body's value temporaries exceed it at model shapes
# (measured: 32.8 MB at 12x228x304 R=4), so the pallas_calls raise
# vmem_limit_bytes and this budget gates shapes that would exceed even that.
# 102 MB: the KITTI-shape one-level forward measures 100.02M of stack (24K
# over a 100M cap); the chip has ~128 MB VMEM and the largest per-call
# in/out block set is ~10 MB, so 102M leaves real headroom.
_VMEM_LIMIT = 102 * 1024 * 1024


def deform_prop_available() -> bool:
    """True when the kernels can run compiled on the default backend."""
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


def _geom(kernel: int, radius: int):
    kc = kernel // 2
    rp = radius + 1 + kc            # pad: offset + ceil corner + kernel shift
    nv = 2 * (radius + kc) + 2      # distinct global shifts U or V
    return kc, rp, nv


def deform_prop_supported(h: int, w: int, kernel: int = 3,
                          radius: int = 4) -> bool:
    """Static production-support gate: full-cache shapes only.

    The one-level (lane-shifted-cache) variants exist and are
    parity-tested, but at KITTI width the one-level BACKWARD's masked
    walk makes Mosaic's register allocator spill 166.8 MB of slots —
    215.7 MB total vs the 128 MB VMEM (measured r05, hard compile
    error). The forward alone compiles there (100.02 M stack), but
    training needs the backward, so the production router only takes
    shapes where the fully-aligned relative-window kernels fit —
    directly (`_full_cache_ok`, NYU-class planes) or via width tiling
    with an rp halo (`_width_tiles`, KITTI-class planes). Anything else
    runs the XLA windowed form.
    """
    if radius < 1 or kernel < 1:
        return False
    return _width_tiles(h, w, kernel, radius) is not None


def _full_cache_ok(h: int, w: int, kernel: int, radius: int,
                   n_big: int) -> bool:
    """Does the fully-aligned two-level cache variant fit VMEM?

    The one-level cache leaves a sublane rotate on every window read (the
    row offset rp+U is not a multiple of the 8-row vreg tile) and, in the
    backward, on every dP accumulate. Materializing all nv*nv (U, V)
    pre-shifted planes once per batch makes every in-loop access fully
    vreg-aligned — ~40 MB at NYU R=4, so it is shape-gated; KITTI-width
    planes fall back to the one-level variant. n_big counts nv*nv
    buffers (1 forward: the read cache; 2 backward: read cache + the
    (U,V)-indexed dP accumulator — affordable once the relative window
    walk dropped the one-level cache and the extra tent planes; the
    earlier masked-walk version measured 102M > the 100M cap).
    """
    kc, rp, nv = _geom(kernel, radius)
    big = nv * nv * h * w * 4
    slack = 20 * (h + 2 * rp) * (w + 2 * rp) * 4
    # n_big is the LARGEST per-call count: the backward splits into a read
    # call (cache2) and a scatter call (dacc2), each holding ONE nv*nv
    # buffer — the combined single-call form measured 113.5M > the cap.
    del n_big
    return big + slack <= _VMEM_LIMIT


# ---------------------------------------------------------------------------
# Forward kernel: one (batch, neighbor) program; out revolves over neighbors.
# ---------------------------------------------------------------------------


def _fwd_kernel(p_ref, off_ref, aff_ref, out_ref, cache_ref, cache2_ref, *,
                kernel: int, radius: int, h: int, w: int,
                full_cache: bool):
    k = pl.program_id(1)
    kc, rp, nv = _geom(kernel, radius)
    # neighbor shift from the row-major neighbor index (traced scalars)
    dy = k // kernel - kc
    dx = jax.lax.rem(k, kernel) - kc

    @pl.when(k == 0)
    def _fill_cache():
        # pre-shifted planes, materialized once per batch element: either
        # all nv*nv (U, V) combinations (full_cache — every in-loop read
        # below becomes fully vreg-aligned) or just the nv lane shifts
        # (the fallback when nv*nv planes exceed VMEM; reads then carry a
        # sublane rotate). The unused scratch is degenerate (1, 1, 1) —
        # carrying both full-size would re-overflow the VMEM stack (the
        # bwd working set measured 102.09M vs the 100M cap with both).
        p = p_ref[0]
        if full_cache:
            for ui, u_g in enumerate(range(-radius - kc, radius + kc + 2)):
                for vi, v_g in enumerate(
                        range(-radius - kc, radius + kc + 2)):
                    cache2_ref[ui * nv + vi] = \
                        p[rp + u_g:rp + u_g + h, rp + v_g:rp + v_g + w]
        else:
            for vi, v_g in enumerate(range(-radius - kc, radius + kc + 2)):
                cache_ref[vi] = p[:, rp + v_g:rp + v_g + w]

    oy = off_ref[0, 0]
    ox = off_ref[0, 1]

    acc = jnp.zeros((h, w), jnp.float32)
    if full_cache:
        # RELATIVE window walk: exactly the (2R+2)^2 active terms of this
        # neighbor's window, tent-weighted by the recentered offsets
        # (hat(ty - u) == hat(oy - u') for u = dy + u') with NO masks —
        # the relative window IS the truncation window, so escaped-offset
        # semantics match the windowed mirror by construction. The cache
        # plane is selected by a DYNAMIC leading index (Mosaic supports
        # it — probed r05); vs the masked global walk this drops ~30%
        # dead terms and all mask arithmetic.
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ox - v))
               for v in range(-radius, radius + 2)]
        for ui, u_r in enumerate(range(-radius, radius + 2)):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - u_r))
            base = (dy + u_r + radius + kc) * nv + dx + kc
            row = jnp.zeros((h, w), jnp.float32)
            for vi in range(2 * radius + 2):
                row = row + cache2_ref[base + vi] * wxs[vi]
            acc = acc + row * wy
    else:
        # one-level cache fallback (KITTI-width shapes): masked GLOBAL
        # walk over lane-shifted planes; reads carry a sublane rotate
        ty = oy + dy.astype(jnp.float32)
        tx = ox + dx.astype(jnp.float32)
        wxs = []
        for v_g in range(-radius - kc, radius + kc + 2):
            in_win = jnp.logical_and(v_g - dx >= -radius,
                                     v_g - dx <= radius + 1)
            wxs.append(jnp.where(
                in_win, jnp.maximum(0.0, 1.0 - jnp.abs(tx - v_g)), 0.0))
        for ui, u_g in enumerate(range(-radius - kc, radius + kc + 2)):
            in_win = jnp.logical_and(u_g - dy >= -radius,
                                     u_g - dy <= radius + 1)
            wy = jnp.where(
                in_win, jnp.maximum(0.0, 1.0 - jnp.abs(ty - u_g)), 0.0)
            row = jnp.zeros((h, w), jnp.float32)
            for vi in range(nv):
                row = row + cache_ref[vi, rp + u_g:rp + u_g + h, :] * wxs[vi]
            acc = acc + row * wy
    contrib = acc * aff_ref[0, 0]

    @pl.when(k == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(k > 0)
    def _acc():
        out_ref[0] = out_ref[0] + contrib


def _deform_fwd_pallas(feat_p, off_p, aff_p, *, kernel: int, radius: int):
    """feat_p: (B, H, W); off_p: (B, 2*K2, H, W); aff_p: (B, K2, H, W)."""
    b, h, w = feat_p.shape
    k2 = kernel * kernel
    kc, rp, nv = _geom(kernel, radius)
    p = jnp.pad(feat_p, ((0, 0), (rp, rp), (rp, rp)))

    full_cache = _full_cache_ok(h, w, kernel, radius, n_big=1)
    kern = functools.partial(_fwd_kernel, kernel=kernel, radius=radius,
                             h=h, w=w, full_cache=full_cache)
    bytes_plane = h * w * 4
    return pl.pallas_call(
        kern,
        grid=(b, k2),
        in_specs=[
            pl.BlockSpec((1, h + 2 * rp, w + 2 * rp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, h, w), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), feat_p.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, 1, 1) if full_cache else (nv, h + 2 * rp, w),
                       jnp.float32),
            pltpu.VMEM((nv * nv, h, w) if full_cache else (1, 1, 1),
                       jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * b * k2 * nv * nv * h * w,
            bytes_accessed=b * bytes_plane * (3 * k2 + 2),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(p, off_p, aff_p)


# ---------------------------------------------------------------------------
# Backward kernel: same grid; daff/doff written per neighbor, dP accumulated
# into per-V lane-aligned scratch, merged once in the last program.
# ---------------------------------------------------------------------------


def _bwd_kernel(p_ref, off_ref, aff_ref, g_ref, dp_ref, doff_ref, daff_ref,
                cache_ref, cache2_ref, dacc_ref, *, kernel: int, radius: int,
                h: int, w: int, full_cache: bool):
    k = pl.program_id(1)
    k2 = kernel * kernel
    kc, rp, nv = _geom(kernel, radius)
    dy = k // kernel - kc
    dx = jax.lax.rem(k, kernel) - kc

    @pl.when(k == 0)
    def _fill_cache():
        p = p_ref[0]
        if full_cache:
            for ui, u_g in enumerate(range(-radius - kc, radius + kc + 2)):
                for vi, v_g in enumerate(
                        range(-radius - kc, radius + kc + 2)):
                    cache2_ref[ui * nv + vi] = \
                        p[rp + u_g:rp + u_g + h, rp + v_g:rp + v_g + w]
        else:
            for vi, v_g in enumerate(range(-radius - kc, radius + kc + 2)):
                cache_ref[vi] = p[:, rp + v_g:rp + v_g + w]
        if not full_cache:
            dacc_ref[...] = jnp.zeros(dacc_ref.shape, jnp.float32)

    oy = off_ref[0, 0]
    ox = off_ref[0, 1]
    g = g_ref[0]
    a = aff_ref[0, 0]
    q = a * g

    # Tent weights and their d/d(offset). d/dt max(0, 1-|t|) = -sign(t)
    # strictly inside the support, 0 outside — with JAX's subgradient
    # conventions at the measure-zero ties, which the mirror's autodiff
    # uses and integer-valued offsets DO hit (a 15M-sample TPU fuzz found
    # one in r05; the integer-offset unit test hits them densely):
    # d|t|/dt at t == 0 is +1 (not sign(0) == 0), and at the support edge
    # |t| == 1 jnp.maximum splits the tie, factor 1/2.
    def _dhat(t, az, in_win=None):
        sgn = jnp.where(t >= 0.0, 1.0, -1.0)
        mag = jnp.where(az < 1.0, 1.0, jnp.where(az == 1.0, 0.5, 0.0))
        d = -sgn * mag
        return d if in_win is None else jnp.where(in_win, d, 0.0)

    s = jnp.zeros((h, w), jnp.float32)     # re-gathered fwd sum (no aff)
    doy = jnp.zeros((h, w), jnp.float32)
    dox = jnp.zeros((h, w), jnp.float32)
    if full_cache:
        # relative window walk (see _fwd_kernel): no masks, (2R+2)^2
        # active terms; cache planes and dP accumulator rows selected by
        # dynamic indices (probed supported on this Mosaic stack).
        wxs, dwxs = [], []
        for v_r in range(-radius, radius + 2):
            t = ox - v_r
            az = jnp.abs(t)
            wxs.append(jnp.maximum(0.0, 1.0 - az))
            dwxs.append(_dhat(t, az))
        for ui, u_r in enumerate(range(-radius, radius + 2)):
            t = oy - u_r
            az = jnp.abs(t)
            wy = jnp.maximum(0.0, 1.0 - az)
            dwy = _dhat(t, az)
            r = jnp.zeros((h, w), jnp.float32)   # sum_v wx * B
            r2 = jnp.zeros((h, w), jnp.float32)  # sum_v dwx * B
            base = (dy + u_r + radius + kc) * nv + dx + kc
            for vi in range(2 * radius + 2):
                bs = cache2_ref[base + vi]
                r = r + bs * wxs[vi]
                r2 = r2 + bs * dwxs[vi]
            s = s + r * wy
            doy = doy + r * dwy
            dox = dox + r2 * wy
    else:
        ty = oy + dy.astype(jnp.float32)
        tx = ox + dx.astype(jnp.float32)
        wxs, dwxs = [], []
        for v_g in range(-radius - kc, radius + kc + 2):
            in_win = jnp.logical_and(v_g - dx >= -radius,
                                     v_g - dx <= radius + 1)
            t = tx - v_g
            az = jnp.abs(t)
            wxs.append(jnp.where(in_win, jnp.maximum(0.0, 1.0 - az), 0.0))
            dwxs.append(_dhat(t, az, in_win))
        for ui, u_g in enumerate(range(-radius - kc, radius + kc + 2)):
            in_win = jnp.logical_and(u_g - dy >= -radius,
                                     u_g - dy <= radius + 1)
            t = ty - u_g
            az = jnp.abs(t)
            wy = jnp.where(in_win, jnp.maximum(0.0, 1.0 - az), 0.0)
            dwy = _dhat(t, az, in_win)
            r = jnp.zeros((h, w), jnp.float32)   # sum_V wx * B
            r2 = jnp.zeros((h, w), jnp.float32)  # sum_V dwx * B
            qy = q * wy
            for vi in range(nv):
                bs = cache_ref[vi, rp + u_g:rp + u_g + h, :]
                r = r + bs * wxs[vi]
                r2 = r2 + bs * dwxs[vi]
                dacc_ref[vi, rp + u_g:rp + u_g + h, :] = (
                    dacc_ref[vi, rp + u_g:rp + u_g + h, :] + qy * wxs[vi])
            s = s + r * wy
            doy = doy + r * dwy
            dox = dox + r2 * wy

    daff_ref[0, 0] = s * g
    doff_ref[0, 0] = doy * q
    doff_ref[0, 1] = dox * q

    if not full_cache:
        @pl.when(k == k2 - 1)
        def _merge_dp():
            # jnp .at[].add on a value would lower to scatter-add
            # (unsupported by Mosaic); slice read-modify-writes on the
            # ref lower to plain vector ops.
            dp_ref[0] = jnp.zeros((h + 2 * rp, w + 2 * rp), jnp.float32)
            for vi, v_g in enumerate(range(-radius - kc, radius + kc + 2)):
                dp_ref[0, :, rp + v_g:rp + v_g + w] = (
                    dp_ref[0, :, rp + v_g:rp + v_g + w] + dacc_ref[vi])


def _bwd_scatter_kernel(off_ref, aff_ref, g_ref, dp_ref, dacc_ref, *,
                        kernel: int, radius: int, h: int, w: int):
    """dP scatter as its own kernel (full-cache shapes): it needs NO plane
    reads — only the tent products of (offset, aff, g) — so splitting it
    from the read kernel halves the per-call VMEM stack (the combined
    version needed cache2 + dacc2 = 113.5 MB > the chip's headroom).
    Accumulates qy*wx into the (U, V)-global plane selected by a DYNAMIC
    LEADING index with fully static rows (a dynamic sublane start is
    rejected by Mosaic: "cannot statically prove index is a multiple of
    8"); merged into the padded-dP output with static offsets at the
    last program."""
    k = pl.program_id(1)
    k2 = kernel * kernel
    kc, rp, nv = _geom(kernel, radius)
    dy = k // kernel - kc
    dx = jax.lax.rem(k, kernel) - kc

    @pl.when(k == 0)
    def _zero():
        dacc_ref[...] = jnp.zeros(dacc_ref.shape, jnp.float32)

    oy = off_ref[0, 0]
    ox = off_ref[0, 1]
    q = aff_ref[0, 0] * g_ref[0]

    wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ox - v))
           for v in range(-radius, radius + 2)]
    for u_r in range(-radius, radius + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - u_r))
        qy = q * wy
        base = (dy + u_r + radius + kc) * nv + dx + kc
        for vi in range(2 * radius + 2):
            dacc_ref[base + vi] = dacc_ref[base + vi] + qy * wxs[vi]

    @pl.when(k == k2 - 1)
    def _merge_dp():
        dp_ref[0] = jnp.zeros((h + 2 * rp, w + 2 * rp), jnp.float32)
        for ui, u_g in enumerate(range(-radius - kc, radius + kc + 2)):
            for vi, v_g in enumerate(range(-radius - kc, radius + kc + 2)):
                y0, x0 = rp + u_g, rp + v_g
                dp_ref[0, y0:y0 + h, x0:x0 + w] = (
                    dp_ref[0, y0:y0 + h, x0:x0 + w]
                    + dacc_ref[ui * nv + vi])


def _deform_bwd_pallas(feat_p, off_p, aff_p, g, *, kernel: int, radius: int):
    b, h, w = feat_p.shape
    k2 = kernel * kernel
    kc, rp, nv = _geom(kernel, radius)
    p = jnp.pad(feat_p, ((0, 0), (rp, rp), (rp, rp)))

    full_cache = _full_cache_ok(h, w, kernel, radius, n_big=2)
    if full_cache:
        def kern(p_ref, off_ref, aff_ref, g_ref, doff_ref, daff_ref,
                 c1, c2, dacc):
            _bwd_kernel(p_ref, off_ref, aff_ref, g_ref, None, doff_ref,
                        daff_ref, c1, c2, dacc, kernel=kernel,
                        radius=radius, h=h, w=w, full_cache=True)
    else:
        kern = functools.partial(_bwd_kernel, kernel=kernel, radius=radius,
                                 h=h, w=w, full_cache=False)
    bytes_plane = h * w * 4
    plane_spec = pl.BlockSpec((1, h + 2 * rp, w + 2 * rp),
                              lambda i, k: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    off_spec = pl.BlockSpec((1, 2, h, w), lambda i, k: (i, k, 0, 0),
                            memory_space=pltpu.VMEM)
    aff_spec = pl.BlockSpec((1, 1, h, w), lambda i, k: (i, k, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, h, w), lambda i, k: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    if full_cache:
        # Two calls (see _bwd_scatter_kernel's docstring): the read
        # kernel (daff/doff, cache2-resident) and the dP scatter
        # (dacc2-resident, no plane reads) — each ~52 MB of stack where
        # the combined version needed 113.5 MB.
        doff, daff = pl.pallas_call(
            kern,
            grid=(b, k2),
            in_specs=[plane_spec, off_spec, aff_spec, g_spec],
            out_specs=(off_spec, aff_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, 2 * k2, h, w), feat_p.dtype),
                jax.ShapeDtypeStruct((b, k2, h, w), feat_p.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, 1, 1), jnp.float32),
                pltpu.VMEM((nv * nv, h, w), jnp.float32),  # read cache
                pltpu.VMEM((1, 1, 1), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=6 * b * k2 * (2 * radius + 2) ** 2 * h * w,
                bytes_accessed=b * bytes_plane * (4 * k2 + 2),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=_interpret(),
        )(p, off_p, aff_p, g)
        scat = functools.partial(_bwd_scatter_kernel, kernel=kernel,
                                 radius=radius, h=h, w=w)
        dp_pad = pl.pallas_call(
            scat,
            grid=(b, k2),
            in_specs=[off_spec, aff_spec, g_spec],
            out_specs=plane_spec,
            out_shape=jax.ShapeDtypeStruct((b, h + 2 * rp, w + 2 * rp),
                                           feat_p.dtype),
            scratch_shapes=[
                pltpu.VMEM((nv * nv, h, w), jnp.float32),  # dP accum
            ],
            cost_estimate=pl.CostEstimate(
                flops=3 * b * k2 * (2 * radius + 2) ** 2 * h * w,
                bytes_accessed=b * bytes_plane * (3 * k2 + 2),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=_interpret(),
        )(off_p, aff_p, g)
    else:
        dp_pad, doff, daff = pl.pallas_call(
            kern,
            grid=(b, k2),
            in_specs=[plane_spec, off_spec, aff_spec, g_spec],
            out_specs=(plane_spec, off_spec, aff_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, h + 2 * rp, w + 2 * rp),
                                     feat_p.dtype),
                jax.ShapeDtypeStruct((b, 2 * k2, h, w), feat_p.dtype),
                jax.ShapeDtypeStruct((b, k2, h, w), feat_p.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((nv, h + 2 * rp, w), jnp.float32),  # lane cache
                pltpu.VMEM((1, 1, 1), jnp.float32),
                pltpu.VMEM((nv, h + 2 * rp, w), jnp.float32),  # dP accum
            ],
            cost_estimate=pl.CostEstimate(
                flops=8 * b * k2 * nv * nv * h * w,
                bytes_accessed=b * bytes_plane * (6 * k2 + 4),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=_interpret(),
        )(p, off_p, aff_p, g)
    # Contributions landing in the zero-pad region are dropped, exactly as
    # the forward's zero padding drops those reads.
    dfeat = dp_pad[:, rp:rp + h, rp:rp + w]
    return dfeat, doff, daff


# ---------------------------------------------------------------------------
# Differentiable op (planar) + NHWC wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _deform_op(feat_p, off_p, aff_p, kernel, radius):
    return _deform_fwd_pallas(feat_p, off_p, aff_p, kernel=kernel,
                              radius=radius)


def _deform_op_fwd(feat_p, off_p, aff_p, kernel, radius):
    out = _deform_op(feat_p, off_p, aff_p, kernel, radius)
    return out, (feat_p, off_p, aff_p)


def _deform_op_bwd(kernel, radius, res, g):
    feat_p, off_p, aff_p = res
    return _deform_bwd_pallas(feat_p, off_p, aff_p, g, kernel=kernel,
                              radius=radius)


_deform_op.defvjp(_deform_op_fwd, _deform_op_bwd)


def _width_tiles(h: int, w: int, kernel: int, radius: int):
    """Smallest even width tiling whose tiles fit the full-cache kernels.

    Returns n (1 = untiled). None when even the narrowest sensible tile
    (>= 64 interior columns) does not fit — then the caller should not
    route Pallas at all. Tile INPUT width is w/n + 2*rp (the rp halo
    below), which is what must fit the per-program VMEM budget.
    """
    kc, rp, nv = _geom(kernel, radius)
    for n in range(1, w // 64 + 1):
        if w % n != 0:
            continue
        wt = w // n + 2 * rp
        big = nv * nv * h * wt * 4
        slack = 20 * (h + 2 * rp) * (wt + 2 * rp) * 4
        # 0.85 margin: the estimator undercounts Mosaic's stack
        # accounting near the cap (measured: a 100.4M estimate compiled
        # to a 108.8M stack at n=2 KITTI tiles and was refused)
        if big + slack <= 0.85 * _VMEM_LIMIT:
            return n
    return None


def _deform_op_tiled(feat_p, off_p, aff_p, kernel: int, radius: int,
                     n: int):
    """Width-tiled wrapper over the SAME full-cache kernels: KITTI-wide
    planes, whose nv^2 cache cannot fit VMEM whole (and whose one-level
    backward register-spills past VMEM — the r05 pinned negative), are
    split into n overlapping tiles with an rp-column halo of REAL data,
    folded into the batch dimension, and interior-sliced after. Interior
    outputs only ever read within the tile + its halo, so they are exact;
    at GLOBAL edges the kernel's internal zero padding is exactly the
    global op's zero padding. The tiling is pure JAX around the
    custom-VJP op, so autodiff's transpose performs the overlap-add of
    the tile dP contributions for free. Overhead: 2*rp/tw recomputed halo
    columns (~4% at KITTI tw=304) + the tile gather/scatter HBM traffic.
    """
    b, h, w = feat_p.shape
    kc, rp, nv = _geom(kernel, radius)
    tw = w // n

    def tile(x):  # (B, C..., H, W) -> (B*n, C..., H, tw + 2*rp)
        pad = [(0, 0)] * (x.ndim - 1) + [(rp, rp)]
        xp = jnp.pad(x, pad)
        parts = [xp[..., t * tw:t * tw + tw + 2 * rp] for t in range(n)]
        return jnp.concatenate([p[:, None] for p in parts], axis=1).reshape(
            (b * n,) + x.shape[1:-1] + (tw + 2 * rp,))

    out_t = _deform_op(tile(feat_p), tile(off_p), tile(aff_p), kernel,
                       radius)
    out_t = out_t.reshape(b, n, h, tw + 2 * rp)[..., rp:rp + tw]
    return jnp.moveaxis(out_t, 1, 2).reshape(b, h, w)


def propagate_deformable_pallas(feat, offset, aff, kernel: int = 3,
                                radius: int = 4):
    """Drop-in for ops.propagate.propagate_deformable_windowed (NHWC),
    self-partitioned over an ambient data mesh (ops/pallas/shard.py).

    feat: (B, H, W, 1); offset: (B, H, W, 2*K2); aff: (B, H, W, K2).
    Same truncated-window semantics as the XLA windowed form for ALL
    offsets (exact iff |offset| <= radius); callers wanting the runtime
    exact fallback go through ops.propagate.propagate_deformable.
    Wide planes are width-tiled (see _deform_op_tiled).
    """
    from nlspn_eccv20_tpu.ops.pallas.shard import shard_over_data

    h, w = feat.shape[1], feat.shape[2]
    n = _width_tiles(h, w, kernel, radius) or 1

    def core(f, o, a):
        if n > 1:
            return _deform_op_tiled(f, o, a, kernel, radius, n)
        return _deform_op(f, o, a, kernel, radius)

    out = shard_over_data(
        core,
        (feat[..., 0].astype(jnp.float32),
         jnp.moveaxis(offset, -1, 1).astype(jnp.float32),
         jnp.moveaxis(aff, -1, 1).astype(jnp.float32)),
        (True, True, True))
    return out[..., None]


def _pure_windowed_planar(feat_p, off_p, aff_p, kernel, radius):
    """Pure-JAX mirror (parity oracle for the tests)."""
    out = propagate_deformable_windowed(
        feat_p[..., None], jnp.moveaxis(off_p, 1, -1),
        jnp.moveaxis(aff_p, 1, -1), kernel=kernel, radius=radius)
    return out[..., 0]
