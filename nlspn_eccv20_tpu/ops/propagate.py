"""Spatial propagation ops (the NLSPN hot path), pure-JAX reference impls.

Two propagation flavors, matching /root/reference/src/model/nlspnmodel.py:

  * ``propagate_local`` — the fork's default path (``--offset`` False):
    replicate-pad the depth plane and take the affinity-weighted sum of the
    k*k integer-shifted neighbors (reference ``_propagate_once`` no-offset
    branch, nlspnmodel.py:210-224). On TPU this is a 9-point stencil; the
    pure-JAX form below compiles to one fused VPU loop (no 9x-unfolded
    tensor is materialized after XLA fusion). A Pallas kernel with the same
    signature lives in ``ops/pallas/local_prop.py``.

  * ``propagate_deformable`` — the non-local path (``--offset`` True):
    affinity-modulated bilinear gather at per-pixel learned offsets. The
    reference routes this through DCNv2 with a frozen all-ones 1x1xkxk
    weight and zero bias (nlspnmodel.py:107-121,204-208) so the "conv"
    degenerates to exactly this gather; we implement the gather directly
    (4 corner gathers + validity masks == the CUDA ``mdmcn_im2col_bilinear``
    zero-outside semantics, modulated_deform_im2col_cuda.cuh:24-54) and let
    XLA derive the (deterministic) scatter-add transpose for the backward
    instead of CUDA's atomicAdd.

Layout: NHWC; depth planes are (B, H, W, 1), affinities (B, H, W, K2),
offsets (B, H, W, 2*K2) with per-neighbor (dy, dx) pairs contiguous
(matching the reference ``_off_insert`` layout, nlspnmodel.py:252-259).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighbor_shifts(kernel: int):
    """Row-major (dy, dx) shifts for a kernel x kernel stencil, center included."""
    r = kernel // 2
    return [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]


def propagate_local_planar(p: jnp.ndarray, aff: jnp.ndarray,
                           kernel: int = 3) -> jnp.ndarray:
    """Fixed-local affinity-weighted propagation step, planar layout.

    TPU NOTE: depth planes are carried WITHOUT a trailing singleton channel.
    On TPU the minor-most dimension is padded to the 128-lane width, so a
    (B, H, W, 1) array is stored with a 128x memory blow-up; the propagation
    loop (a scan with per-step residuals) must run on (B, H, W) planes and
    (B, K2, H, W) affinities, whose minor dims tile cleanly.

    p:   (B, H, W) depth plane (already confidence-weighted by caller).
    aff: (B, K2, H, W) normalized affinities, K2 = kernel**2, row-major
         neighbor order with the center at index K2 // 2.
    Returns (B, H, W).
    """
    assert kernel % 2 == 1
    k2 = kernel * kernel
    assert aff.shape[1] == k2, f"aff has {aff.shape[1]} ch, want {k2}"
    b, h, w = p.shape

    r = kernel // 2
    padded = jnp.pad(p, ((0, 0), (r, r), (r, r)), mode="edge")
    out = jnp.zeros((b, h, w), dtype=p.dtype)
    for idx, (dy, dx) in enumerate(_neighbor_shifts(kernel)):
        window = jax.lax.dynamic_slice(
            padded, (0, dy + r, dx + r), (b, h, w)
        )
        out = out + window * aff[:, idx]
    return out


def propagate_local(feat: jnp.ndarray, aff: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """NHWC wrapper over propagate_local_planar.

    feat: (B, H, W, 1); aff: (B, H, W, K2). Returns (B, H, W, 1).
    """
    assert feat.shape[-1] == 1
    out = propagate_local_planar(feat[..., 0], jnp.moveaxis(aff, -1, 1),
                                 kernel=kernel)
    return out[..., None]


def propagate_deformable_exact(
    feat: jnp.ndarray,
    offset: jnp.ndarray,
    aff: jnp.ndarray,
    kernel: int = 3,
) -> jnp.ndarray:
    """Non-local propagation: per-pixel bilinear gather at learned offsets.

    feat:   (B, H, W, 1)
    offset: (B, H, W, 2*K2) learned (dy, dx) per neighbor (center pair zero).
    aff:    (B, H, W, K2) normalized affinities (modulation).
    Returns (B, H, W, 1).

    Sampling location for neighbor j at pixel (y, x):
        (y + dy_j + off_y_j(y, x),  x + dx_j + off_x_j(y, x))
    where (dy_j, dx_j) is the integer kernel shift. Samples fully outside the
    image contribute zero (DCNv2 zero-padding semantics).

    This is the unconditionally-exact formulation, but XLA lowers the
    per-pixel gather to a scalar(ish) TPU loop: measured 308 ms for ONE
    step at NYU b=12 (docs/PERFORMANCE.md). Production path is
    ``propagate_deformable`` below (windowed reformulation + runtime
    fallback to this one).
    """
    b, h, w, c = feat.shape
    assert c == 1
    k2 = kernel * kernel
    assert aff.shape[-1] == k2 and offset.shape[-1] == 2 * k2

    dtype = feat.dtype
    off = offset.reshape(b, h, w, k2, 2)
    shifts = jnp.asarray(_neighbor_shifts(kernel), dtype=dtype)  # (K2, 2)

    ys = jax.lax.broadcasted_iota(dtype, (b, h, w, k2), 1)
    xs = jax.lax.broadcasted_iota(dtype, (b, h, w, k2), 2)
    sy = ys + shifts[:, 0] + off[..., 0]
    sx = xs + shifts[:, 1] + off[..., 1]

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    ly = sy - y0  # differentiable in offset (d/d off = 1)
    lx = sx - x0

    flat = feat[..., 0].reshape(b, h * w)

    def corner(yc, xc, wy, wx):
        valid = (yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        idx = (yi * w + xi).reshape(b, h * w * k2)
        vals = jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, k2)
        return jnp.where(valid, vals, 0.0) * wy * wx

    acc = (
        corner(y0, x0, 1.0 - ly, 1.0 - lx)
        + corner(y0, x0 + 1, 1.0 - ly, lx)
        + corner(y0 + 1, x0, ly, 1.0 - lx)
        + corner(y0 + 1, x0 + 1, ly, lx)
    )
    out = jnp.sum(acc * aff, axis=-1, keepdims=True)
    return out


def propagate_deformable_windowed(
    feat: jnp.ndarray,
    offset: jnp.ndarray,
    aff: jnp.ndarray,
    kernel: int = 3,
    radius: int = 4,
) -> jnp.ndarray:
    """Windowed (shift-and-select) deformable gather — TPU-native form.

    Exact whenever every learned offset component lies in
    ``[-radius, radius]`` (the center pair is zero by construction and the
    offset head is zero-initialized, so trained offsets are small local
    displacements; ``propagate_deformable`` adds a runtime fallback for the
    rest). The bilinear sample per neighbor is rewritten as a tent-weighted
    sum over the static integer window around that neighbor's kernel shift:

        out_k(y, x) = sum_{u, v} hat(ty-u) * hat(tx-v) * P(y+u, x+v)

    with ``hat(t) = max(0, 1-|t|)`` and (ty, tx) the total fractional
    displacement. Every term is a static shifted slice — vector ops the
    VPU/XLA can fuse, no data-dependent gather. The hat function's
    piecewise-linear derivative reproduces the CUDA coordinate gradients
    (``mdmcn_get_coordinate_weight``, modulated_deform_im2col_cuda.cuh:83-125)
    under plain autodiff, and zero-padded shifts reproduce the CUDA
    zero-outside-image semantics (cuh:24-54).
    """
    b, h, w, c = feat.shape
    assert c == 1
    k2 = kernel * kernel
    assert aff.shape[-1] == k2 and offset.shape[-1] == 2 * k2

    off = offset.reshape(b, h, w, k2, 2)
    shifts = _neighbor_shifts(kernel)
    rp = radius + 1 + kernel // 2  # offset + ceil corner + kernel shift
    p = jnp.pad(feat[..., 0], ((0, 0), (rp, rp), (rp, rp)))

    out = jnp.zeros((b, h, w), feat.dtype)
    for ki, (dy, dx) in enumerate(shifts):
        ty = off[..., ki, 0] + dy
        tx = off[..., ki, 1] + dx
        a = aff[..., ki]
        us = range(dy - radius, dy + radius + 2)
        vs = range(dx - radius, dx + radius + 2)
        # horizontal tent weights are shared across the row window
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(tx - v)) for v in vs]
        acc = jnp.zeros((b, h, w), feat.dtype)
        for u in us:
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty - u))
            row = jnp.zeros((b, h, w), feat.dtype)
            for v, wx in zip(vs, wxs):
                sp = p[:, rp + u:rp + u + h, rp + v:rp + v + w]
                row = row + sp * wx
            acc = acc + row * wy
        out = out + acc * a
    return out[..., None]


def propagate_deformable_windowed_scan(
    feat: jnp.ndarray,
    offset: jnp.ndarray,
    aff: jnp.ndarray,
    kernel: int = 3,
    radius: int = 4,
) -> jnp.ndarray:
    """``propagate_deformable_windowed`` with a ``lax.scan`` over neighbors.

    Bit-identical math; the K2 neighbor bodies (each (2r+2)^2 shifted
    slices) collapse into ONE traced body + dynamic slices at traced
    shift starts, cutting HLO size ~K2x. Measured to decide the offset
    train-step routing (VERDICT r3 item 5); see docs/PERFORMANCE.md.
    """
    b, h, w, c = feat.shape
    assert c == 1
    k2 = kernel * kernel
    assert aff.shape[-1] == k2 and offset.shape[-1] == 2 * k2

    off = offset.reshape(b, h, w, k2, 2)
    shifts = jnp.asarray(_neighbor_shifts(kernel), jnp.int32)  # (K2, 2)
    rp = radius + 1 + kernel // 2
    p = jnp.pad(feat[..., 0], ((0, 0), (rp, rp), (rp, rp)))

    off_t = jnp.moveaxis(off, 3, 0)      # (K2, B, H, W, 2)
    aff_t = jnp.moveaxis(aff, -1, 0)     # (K2, B, H, W)

    def body(acc, inp):
        sh, o, a = inp
        dy, dx = sh[0], sh[1]
        # recentered window: u', v' in [-radius, radius+1] around the
        # neighbor shift; tent weight hat(off - u') (== hat(ty - u) of the
        # unrolled form with u = dy + u')
        oy, ox = o[..., 0], o[..., 1]
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(ox - v))
               for v in range(-radius, radius + 2)]
        racc = jnp.zeros((b, h, w), feat.dtype)
        for u in range(-radius, radius + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy - u))
            row = jnp.zeros((b, h, w), feat.dtype)
            for vi, v in enumerate(range(-radius, radius + 2)):
                sp = jax.lax.dynamic_slice(
                    p, (0, rp + dy + u, rp + dx + v), (b, h, w))
                row = row + sp * wxs[vi]
            racc = racc + row * wy
        return acc + racc * a, None

    out, _ = jax.lax.scan(body, jnp.zeros((b, h, w), feat.dtype),
                          (shifts, off_t, aff_t))
    return out[..., None]


def propagate_deformable_windowed_union(
    feat: jnp.ndarray,
    offset: jnp.ndarray,
    aff: jnp.ndarray,
    kernel: int = 3,
    radius: int = 4,
) -> jnp.ndarray:
    """Windowed gather re-associated over the UNION of global shifts.

    Identical math to ``propagate_deformable_windowed`` (same tent
    weights, re-associated): instead of 9 neighbors x (2R+2)^2 slice
    multiplies of the padded plane (~900 shifted-slice applications), sum
    the per-neighbor affinity-scaled tent products into ONE weight field
    per GLOBAL shift (U, V) and apply the plane slice once per global
    shift — (2R+2k//2+2)^2 = 144 slice applications at R=4, k=3. The
    weight assembly is pure aligned elementwise math XLA fuses freely;
    only the 144 plane slices carry shifted operands. FLOPs are equal;
    the intent was to cut the slice-handling/fusion-splitting overhead
    that holds the unrolled form ~10x over its VPU roofline.

    MEASURED (r04, v5e, 12x228x304, devtools/exp_union_gather.py):
    SLOWER — fwd 4785 us vs 2290 us unrolled, fwd+bwd 18480 vs 14548 us.
    The ~180 materialized tent-term fields cost more HBM traffic than
    the 756 avoided slice applications save; XLA fuses the unrolled
    form's static slices better than predicted. Kept as an op-library
    primitive with its negative result pinned (equivalence-tested);
    production stays on the unrolled windowed form.
    """
    b, h, w, c = feat.shape
    assert c == 1
    k2 = kernel * kernel
    assert aff.shape[-1] == k2 and offset.shape[-1] == 2 * k2

    off = offset.reshape(b, h, w, k2, 2)
    shifts = _neighbor_shifts(kernel)
    kc = kernel // 2
    rp = radius + 1 + kc
    p = jnp.pad(feat[..., 0], ((0, 0), (rp, rp), (rp, rp)))

    # per-neighbor 1-D tent terms (aff folded into the row term)
    wy_terms = {}
    wx_terms = {}
    for ki, (dy, dx) in enumerate(shifts):
        ty = off[..., ki, 0] + dy
        tx = off[..., ki, 1] + dx
        a = aff[..., ki]
        for u in range(dy - radius, dy + radius + 2):
            wy_terms[(ki, u)] = a * jnp.maximum(0.0, 1.0 - jnp.abs(ty - u))
        for v in range(dx - radius, dx + radius + 2):
            wx_terms[(ki, v)] = jnp.maximum(0.0, 1.0 - jnp.abs(tx - v))

    out = jnp.zeros((b, h, w), feat.dtype)
    for U in range(-radius - kc, radius + kc + 2):
        for V in range(-radius - kc, radius + kc + 2):
            wf = None
            for ki, (dy, dx) in enumerate(shifts):
                if (dy - radius <= U <= dy + radius + 1
                        and dx - radius <= V <= dx + radius + 1):
                    t = wy_terms[(ki, U)] * wx_terms[(ki, V)]
                    wf = t if wf is None else wf + t
            if wf is None:
                continue
            sp = p[:, rp + U:rp + U + h, rp + V:rp + V + w]
            out = out + sp * wf
    return out[..., None]


def propagate_deformable(
    feat: jnp.ndarray,
    offset: jnp.ndarray,
    aff: jnp.ndarray,
    kernel: int = 3,
    radius: int = 4,
    impl: str = "auto",
    fallback: bool = True,
    neighbor_loop: str = "unroll",
) -> jnp.ndarray:
    """Deformable propagation step: windowed fast path + exact fallback.

    neighbor_loop: 'unroll' | 'scan' — codegen of the K2-neighbor loop in
    the windowed form ('scan' collapses the 9 unrolled bodies into one
    lax.scan body, ~K2x smaller HLO; identical math).

    fallback=True (inference): runtime-selects (``lax.cond``) the
    TPU-friendly windowed formulation when ``max|offset| <= radius`` —
    true from step 0 (zero-init offset head) through convergence for
    NLSPN's local displacements — and the unconditionally-exact gather
    otherwise, so the op is exact for ALL offsets while paying the fast
    path in the overwhelmingly common case.

    fallback=False (training): clamp offsets into ``[-radius, radius]``
    and run the windowed form unconditionally. Rationale (r03, measured):
    a ``lax.cond`` compiles BOTH branches, and the exact gather's
    backward materializes s32 scatter-index temporaries shaped
    ``[B, H*W*K2, 1]`` whose trailing singleton pads 128x on TPU —
    3.57 GB apiece, x12 unrolled steps = the full-model --offset TRAIN
    step does not compile at NYU batch 12 (tpu_compile_helper OOM). The
    clamp is exact whenever offsets stay in the window (their regime by
    construction — zero-init head, local displacements; the clamp's zero
    gradient beyond the window also keeps escaped offsets from drifting
    further), and eval/test still runs the exact-fallback form.
    ``radius=None`` forces the exact path regardless.

    impl: 'xla' => the pure-XLA windowed form (measured 135x over the
    exact gather on v5e, docs/PERFORMANCE.md). 'pallas' => the fused
    shift-accumulate Pallas kernel pair (ops/pallas/deform_prop.py,
    grid-over-neighbors + lane-shifted plane cache; identical windowed
    semantics incl. truncation, custom Pallas backward) when the backend
    supports it at this shape, else the XLA form. 'auto' resolves in the
    model (models/nlspn._prop_and_blend) where the sharding config is
    known; at op level it means 'xla'.
    """
    if radius is None:
        return propagate_deformable_exact(feat, offset, aff, kernel=kernel)

    def fast(f, o, a):
        if impl == "pallas":
            from nlspn_eccv20_tpu.ops.pallas.deform_prop import (
                deform_prop_available,
                deform_prop_supported,
                propagate_deformable_pallas,
            )

            if (deform_prop_available()
                    and deform_prop_supported(f.shape[1], f.shape[2],
                                              kernel, radius)):
                return propagate_deformable_pallas(f, o, a, kernel=kernel,
                                                   radius=radius)
        if neighbor_loop == "scan":
            return propagate_deformable_windowed_scan(f, o, a, kernel=kernel,
                                                      radius=radius)
        return propagate_deformable_windowed(f, o, a, kernel=kernel,
                                             radius=radius)

    if not fallback:
        return fast(feat, jnp.clip(offset, -radius, radius), aff)

    in_range = jnp.max(jnp.abs(offset)) <= radius

    return jax.lax.cond(
        in_range,
        fast,
        lambda f, o, a: propagate_deformable_exact(f, o, a, kernel=kernel),
        feat, offset, aff)


def propagate_step(
    feat: jnp.ndarray,
    aff: jnp.ndarray,
    offset=None,
    kernel: int = 3,
    impl: str = "auto",
    radius: int = 4,
) -> jnp.ndarray:
    """One propagation step; dispatches local vs deformable and backend.

    impl: 'auto' | 'xla' | 'pallas'. On the local path it picks the
    stencil backend. On the deformable path it is accepted-but-inert:
    every impl uses the XLA windowed formulation (the Pallas deformable
    kernel was excised — see propagate_deformable's docstring).
    radius: deformable windowed-gather radius, forwarded so op-level
    callers can match ``cfg.offset_window`` (``None`` => exact path).
    """
    if offset is not None:
        return propagate_deformable(feat, offset, aff, kernel=kernel,
                                    impl=impl, radius=radius)
    if impl in ("xla", "auto"):
        return propagate_local(feat, aff, kernel=kernel)
    if impl == "pallas":
        from nlspn_eccv20_tpu.ops.pallas.local_prop import (
            propagate_local_pallas,
        )

        return propagate_local_pallas(feat, aff, kernel=kernel)
    raise ValueError(f"unknown impl {impl}")
