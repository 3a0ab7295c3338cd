"""Fused Pallas TPU kernel for the encode_dep front: conv0 + ReLU + conv1.

The reference GRU depth encoder (/root/reference/src/model/nlspnmodel.py:
134-138) downsamples the loop-carried depth plane with three stride-2
convolutions, once per propagation iteration (11x per step). Its first two
stages — conv0 (1->16, full resolution) and conv1 (16->2*GRU_input_dim at
1/2) — have 1/16-channel tensors whose XLA layouts pad to 128 lanes, costing
~12.5 ms/step at NYU batch 12 (device profile). conv2 (256->128) is
well-shaped and stays on the stock conv path.

Same machinery as ops/pallas/dec_aff_tail.py, mirrored for strided convs
(the interleave sits on the INPUT side):

With normal (un-flipped) kernel storage, a 1-D k=3/s=2/p=1 conv reads::

    y[i] = K[0] x[2i-1] + K[1] x[2i] + K[2] x[2i+1]

so on the conv1-OUTPUT grid (H/4, W/4), the full-res input splits into 16
phases (4x4 decimation) and BOTH convs become four wide MXU matmuls each
(one per distinct grid shift in {0,-1}^2), with tap placement baked into
shift-indexed weight matrices::

    X16 = de-interleave(x)                          # (pixels, 16 phases)
    P0  = relu( sum_s shift_s(X16 @ W0S[s]) + b0 )  # (pixels, 4 x 16)
    OUT = relu( sum_s shift_s(P0 @ W1S[s]) + b1 )   # (pixels, C1)

De-interleave runs in-kernel: sublane-strided loads pick row phases, one-hot
decimation matmuls (D[ax]: full-res col 4j+ax -> grid col j) pick column
phases. The output is plain NHWC (B, H/4, W/4, C1) — no assembly needed.
The custom backward is the exact transpose, with the dx re-interleave using
the lane-expansion-matmul + sublane-strided-store pattern.

Requires H % 4 == 0 and W % 4 == 0 (all reference configs satisfy this);
the public op falls back to the stock composition otherwise and off-TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.ops.pallas.dec_aff_tail import (
    _dot,
    _dot_t,
    _interpret,
    _round_up,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# 1-D rules for k=3/s2/p1 convs with normal kernel storage:
# y[i] = sum over taps t: K[t] @ x[2i + t - 1]  ->  (phase, shift) per tap
_CONV_RULES = {0: (1, -1), 1: (0, 0), 2: (1, 0)}
_NSHIFTS = ((0, 0), (0, -1), (-1, 0), (-1, -1))     # (row, col) grid shifts


def _conv0_placement():
    """[(x_phase16, out_phase4, tap9, shift_index)] for conv0 on the
    quarter grid: y1[2u+py, 2v+px] reads x[4u + 2py+ty-1, 4v + 2px+tx-1]."""
    out = []
    for py in range(2):
        for ty in range(3):
            fy = 2 * py + ty - 1
            ay, sy = fy % 4, fy // 4          # floor div: -1 -> (3, -1)
            for px in range(2):
                for tx in range(3):
                    fx = 2 * px + tx - 1
                    ax, sx = fx % 4, fx // 4
                    out.append((4 * ay + ax, 2 * py + px, 3 * ty + tx,
                                _NSHIFTS.index((sy, sx))))
    return out


def _conv1_placement():
    """[(y1_phase4, tap9, shift_index)] for conv1 on the quarter grid."""
    out = []
    for ty in range(3):
        py, sy = _CONV_RULES[ty]
        for tx in range(3):
            px, sx = _CONV_RULES[tx]
            out.append((2 * py + px, 3 * ty + tx, _NSHIFTS.index((sy, sx))))
    return out


def _pick_tiles(wo: int) -> Tuple[int, int, int]:
    if wo <= 126:
        return 1, wo, 0
    for tw in range(125, 0, -1):
        if wo % tw == 0:
            return wo // tw, tw, 1
    raise ValueError(f"cannot tile base-grid width {wo}")


# ---------------------------------------------------------------------------
# Pure-JAX reference (fallback + ground truth)
# ---------------------------------------------------------------------------

def _conv_s2(x, w, b):
    """Conv2d(k3, s2, p1) + bias, NHWC — exactly models/common.Conv."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def dep_encode_front_reference(xplane, w0, b0, w1, b1):
    """relu(conv1(relu(conv0(x)))) -> NHWC (B, H/4ish, W/4ish, C1)."""
    x = xplane[..., None]
    y1 = jax.nn.relu(_conv_s2(x, w0, b0))
    return jax.nn.relu(_conv_s2(y1, w1, b1))


# ---------------------------------------------------------------------------
# Weight / constant prep
# ---------------------------------------------------------------------------

def _prep_weights(w0, b0, w1, b1, dt):
    m = w0.shape[3]
    c1 = w1.shape[3]
    w0f = w0.reshape(9, m)                    # (tap, out-ch); in-ch == 1
    w1f = w1.reshape(9, m, c1)
    w0s = jnp.zeros((4, 16, 4 * m), w0.dtype)
    for xp, op, tap, si in _conv0_placement():
        w0s = w0s.at[si, xp, op * m:(op + 1) * m].set(w0f[tap])
    w1s = jnp.zeros((4, 4 * m, c1), w1.dtype)
    for p, tap, si in _conv1_placement():
        w1s = w1s.at[si, p * m:(p + 1) * m, :].set(w1f[tap])
    return (w0s.astype(dt), jnp.tile(b0, 4).astype(dt),
            w1s.astype(dt), b1.astype(dt))


def _fold_weight_grads(dw0s, dw1s, m, c1):
    dw0f = jnp.zeros((9, m), jnp.float32)
    for xp, op, tap, si in _conv0_placement():
        dw0f = dw0f.at[tap].add(dw0s[si, xp, op * m:(op + 1) * m])
    dw1f = jnp.zeros((9, m, c1), jnp.float32)
    for p, tap, si in _conv1_placement():
        dw1f = dw1f.at[tap].add(dw1s[si, p * m:(p + 1) * m, :])
    return dw0f.reshape(3, 3, 1, m), dw1f.reshape(3, 3, m, c1)


def _decim_mats(twh: int, owp: int):
    """D[ax]: (owp, 128) one-hot mapping full-res local col 4j+ax ->
    grid col j (j < twh)."""
    d = np.zeros((4, owp, 128), np.float32)
    for ax in range(4):
        for j in range(twh):
            if 4 * j + ax < owp:
                d[ax, 4 * j + ax, j] = 1.0
    return jnp.asarray(d)


FORCE_PALLAS_INTERPRET = False


def _too_serial(xplane_shape) -> bool:
    """At grid sizes of ~1 program the kernel is latency-bound (no pipeline
    overlap) and measurably SLOWS b=1 inference (b=1 NYU: 4.7 -> 7.4 ms);
    fall back to the stock convs there."""
    if FORCE_PALLAS_INTERPRET:
        return False
    bsz, h, w = xplane_shape
    n_tiles, _, _ = _pick_tiles(w // 4)
    return bsz * n_tiles < 4


def _use_pallas() -> bool:
    if not _PALLAS_OK:
        return False
    if FORCE_PALLAS_INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Kernel helpers (signed-shift variants of the dec_aff_tail machinery)
# ---------------------------------------------------------------------------

def _sshift_matmul_sum(xf, ws_ref, nr, width):
    """sum_s shift_s(xf @ WS[s]) with SIGNED shifts: out[r] = z[r + s]."""
    acc = jnp.zeros((nr, width), jnp.float32)
    for si, (sy, sx) in enumerate(_NSHIFTS):
        z = _dot(xf, ws_ref[si])
        zp = jnp.pad(z, ((130, 130), (0, 0)))
        s = sy * 128 + sx
        acc = acc + zp[130 + s:130 + s + nr]
    return acc


def _sunshift_matmul_sum(g, ws_t_ref, nr, width):
    """Transpose direction: out[r] = sum_s (g[r - s] @ WS[s]^T)."""
    ge = jnp.pad(g, ((130, 130), (0, 0)))
    acc = jnp.zeros((nr, width), jnp.float32)
    for si, (sy, sx) in enumerate(_NSHIFTS):
        s = sy * 128 + sx
        acc = acc + _dot(ge[130 - s:130 - s + nr], ws_t_ref[si])
    return acc


def _deinterleave_x(x_ref, ho, twh, owp, nr, dt, d_ref):
    """(1, 1, 4*ho, owp//128, 128) plane block -> X16 (nr, 16)."""
    x16t = None
    for ay in range(4):
        rows = x_ref[0, 0, ay::4].reshape(ho, owp)       # (ho, owp)
        for ax in range(4):
            piece = _dot(rows, d_ref[ax])                # (ho, 128)
            piece = jnp.pad(piece.astype(dt), ((1, 1), (0, 0)))
            piece = piece[None].reshape(1, nr)           # (1, (ho+2)*128)
            i = 4 * ay + ax
            piece = jnp.pad(piece, ((i, 15 - i), (0, 0)))
            x16t = piece if x16t is None else x16t + piece
    return x16t.T                                        # (nr, 16)


def _recompute_fwd(x_ref, w0s_ref, b0_ref, w1s_ref, b1_ref, d_ref, *,
                   ho, tw, halo, twh, owp, m, c1, n_tiles, t, dt):
    nr = (ho + 2) * 128
    x16 = _deinterleave_x(x_ref, ho, twh, owp, nr, dt, d_ref)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0) // 128
    cols = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0) % 128
    lo = jnp.where(t == 0, halo, 0)
    hi = jnp.where(t == n_tiles - 1, halo + tw, twh)
    valid = ((rows >= 1) & (rows <= ho) & (cols >= lo) & (cols < hi))
    p0_f32 = _sshift_matmul_sum(x16, w0s_ref, nr, 4 * m) \
        + b0_ref[:].astype(jnp.float32)
    p0_f32 = jnp.where(valid, jnp.maximum(p0_f32, 0.0), 0.0)
    p0 = p0_f32.astype(dt)
    out_f32 = _sshift_matmul_sum(p0, w1s_ref, nr, c1) \
        + b1_ref[:].astype(jnp.float32)
    out_f32 = jnp.where(valid, jnp.maximum(out_f32, 0.0), 0.0)
    return x16, p0_f32, p0, out_f32


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w0s_ref, b0_ref, w1s_ref, b1_ref, d_ref, out_ref, *,
                ho: int, tw: int, halo: int, twh: int, owp: int, m: int,
                c1: int, n_tiles: int):
    t = pl.program_id(1)
    dt = out_ref.dtype
    _, _, _, out_f32 = _recompute_fwd(
        x_ref, w0s_ref, b0_ref, w1s_ref, b1_ref, d_ref, ho=ho, tw=tw,
        halo=halo, twh=twh, owp=owp, m=m, c1=c1, n_tiles=n_tiles, t=t, dt=dt)
    out = out_f32.astype(dt).reshape(ho + 2, 128, c1)
    out_ref[0, 0] = out[1:ho + 1, halo:halo + tw]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, g_ref, w0s_ref, b0_ref, w1s_ref, b1_ref, d_ref,
                w1s_t_ref, w0s_t_ref, dmt_ref,
                dx_ref, dw0s_ref, db0_ref, dw1s_ref, db1_ref, *,
                ho: int, tw: int, halo: int, twh: int, owp: int, m: int,
                c1: int, n_tiles: int):
    nr = (ho + 2) * 128
    t = pl.program_id(1)
    dt = g_ref.dtype
    first = (pl.program_id(0) == 0) & (t == 0)

    x16, p0_f32, p0, out_f32 = _recompute_fwd(
        x_ref, w0s_ref, b0_ref, w1s_ref, b1_ref, d_ref, ho=ho, tw=tw,
        halo=halo, twh=twh, owp=owp, m=m, c1=c1, n_tiles=n_tiles, t=t, dt=dt)

    # cotangent -> flat with guards; mask by conv1's relu
    g = g_ref[0, 0]                                     # (ho, tw, c1)
    gf = jnp.pad(g, ((1, 1), (halo, 128 - tw - halo), (0, 0)))
    gf = gf.reshape(nr, c1)
    gm = jnp.where(out_f32 > 0, gf.astype(jnp.float32), 0.0).astype(dt)

    # dP0 with conv0's relu mask
    dp0 = _sunshift_matmul_sum(gm, w1s_t_ref, nr, 4 * m)
    dp0 = jnp.where(p0_f32 > 0, dp0, 0.0).astype(dt)

    # dX16 -> re-interleave to the full-res plane gradient
    dx16 = _sunshift_matmul_sum(dp0, w0s_t_ref, nr, 16).astype(dt)
    # (16, nr) -> (16, ho+2, 128): 3-D split keeps the cast supported
    # (a 1-D (nr,) -> (ho+2, 128) reshape fails layout inference).
    dx16t = dx16.T.reshape(16, ho + 2, 128)
    for ay in range(4):
        acc = None
        for ax in range(4):
            piece = dx16t[4 * ay + ax][1:ho + 1]
            r = _dot(piece, dmt_ref[ax])                # (ho, owp) f32
            acc = r if acc is None else acc + r
        # dx stays f32: strided stores support only 32-bit data
        dx_ref[0, 0, ay::4] = acc.reshape(ho, owp // 128, 128)

    # weight/bias grads (signed shifts: dW[s] = shift_s(input)^T @ grad)
    x16e = jnp.pad(x16, ((130, 130), (0, 0)))
    p0e = jnp.pad(p0, ((130, 130), (0, 0)))
    dw0s, dw1s = [], []
    for si, (sy, sx) in enumerate(_NSHIFTS):
        s = sy * 128 + sx
        dw0s.append(_dot_t(x16e[130 + s:130 + s + nr], dp0))
        dw1s.append(_dot_t(p0e[130 + s:130 + s + nr], gm))
    db0 = jnp.sum(dp0.astype(jnp.float32), axis=0, keepdims=True)
    db1 = jnp.sum(gm.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(first)
    def _init():
        for si in range(4):
            dw0s_ref[si] = dw0s[si]
            dw1s_ref[si] = dw1s[si]
        db0_ref[:] = db0
        db1_ref[:] = db1

    @pl.when(jnp.logical_not(first))
    def _acc():
        for si in range(4):
            dw0s_ref[si] = dw0s_ref[si] + dw0s[si]
            dw1s_ref[si] = dw1s_ref[si] + dw1s[si]
        db0_ref[:] = db0_ref[:] + db0
        db1_ref[:] = db1_ref[:] + db1


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _geom(xplane_shape):
    bsz, h, w = xplane_shape
    assert h % 4 == 0 and w % 4 == 0
    ho, wo = h // 4, w // 4
    n_tiles, tw, halo = _pick_tiles(wo)
    twh = tw + 2 * halo
    owp = _round_up(4 * twh, 128)
    return bsz, h, w, ho, wo, n_tiles, tw, halo, twh, owp


def _tile_plane(xplane, n_tiles, tw, halo, owp):
    """-> (B, nt, H, owp//128, 128) full-res column tiles (zero-padded)."""
    bsz, h, w = xplane.shape
    if n_tiles == 1:
        xp = jnp.pad(xplane, ((0, 0), (0, 0), (0, owp - w)))
        return xp.reshape(bsz, 1, h, owp // 128, 128)
    xp = jnp.pad(xplane, ((0, 0), (0, 0), (4 * halo, 4 * halo)))
    tiles = []
    for t in range(n_tiles):
        sl = xp[:, :, t * 4 * tw:t * 4 * tw + 4 * (tw + 2 * halo)]
        tiles.append(jnp.pad(sl, ((0, 0), (0, 0), (0, owp - sl.shape[2]))))
    return jnp.stack(tiles, axis=1).reshape(bsz, n_tiles, h, owp // 128, 128)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i, t, _s=len(shape): (0,) * _s,
                        memory_space=pltpu.VMEM)


def _fwd_pallas(xplane, w0, b0, w1, b1, dt):
    bsz, h, w, ho, wo, n_tiles, tw, halo, twh, owp = _geom(xplane.shape)
    m, c1 = w0.shape[3], w1.shape[3]
    w0s, b0r, w1s, b1r = _prep_weights(w0, b0, w1, b1, dt)
    d = _decim_mats(twh, owp)
    xt = _tile_plane(xplane.astype(jnp.float32), n_tiles, tw, halo, owp)

    kern = functools.partial(
        _fwd_kernel, ho=ho, tw=tw, halo=halo, twh=twh, owp=owp, m=m, c1=c1,
        n_tiles=n_tiles)
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, h, owp // 128, 128),
                         lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((4, 16, 4 * m)), _full_spec((1, 4 * m)),
            _full_spec((4, 4 * m, c1)), _full_spec((1, c1)),
            _full_spec((4, owp, 128)),
        ],
        out_specs=pl.BlockSpec((1, 1, ho, tw, c1),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles, ho, tw, c1), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=8 * bsz * n_tiles * (ho + 2) * 128 * (16 + c1) * 4 * m,
            bytes_accessed=(xt.size + bsz * wo * ho * c1) * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(xt, w0s, b0r[None], w1s, b1r[None], d)

    if n_tiles == 1:
        return out[:, 0]
    return jnp.concatenate([out[:, t] for t in range(n_tiles)], axis=2)


def _bwd_pallas(xplane, w0, b0, w1, b1, dt, g):
    bsz, h, w, ho, wo, n_tiles, tw, halo, twh, owp = _geom(xplane.shape)
    m, c1 = w0.shape[3], w1.shape[3]
    w0s, b0r, w1s, b1r = _prep_weights(w0, b0, w1, b1, dt)
    d = _decim_mats(twh, owp)
    dtm = jnp.transpose(d, (0, 2, 1))
    w1st = jnp.transpose(w1s, (0, 2, 1))
    w0st = jnp.transpose(w0s, (0, 2, 1))
    xt = _tile_plane(xplane.astype(jnp.float32), n_tiles, tw, halo, owp)

    g = g.astype(dt)
    if n_tiles == 1:
        gt = g[:, None]
    else:
        gt = jnp.stack([g[:, :, t * tw:(t + 1) * tw]
                        for t in range(n_tiles)], axis=1)

    kern = functools.partial(
        _bwd_kernel, ho=ho, tw=tw, halo=halo, twh=twh, owp=owp, m=m, c1=c1,
        n_tiles=n_tiles)
    dxt, dw0s, db0r, dw1s, db1r = pl.pallas_call(
        kern,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, h, owp // 128, 128),
                         lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ho, tw, c1), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((4, 16, 4 * m)), _full_spec((1, 4 * m)),
            _full_spec((4, 4 * m, c1)), _full_spec((1, c1)),
            _full_spec((4, owp, 128)),
            _full_spec((4, c1, 4 * m)), _full_spec((4, 4 * m, 16)),
            _full_spec((4, 128, owp)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, h, owp // 128, 128),
                         lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((4, 16, 4 * m)), _full_spec((1, 4 * m)),
            _full_spec((4, 4 * m, c1)), _full_spec((1, c1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_tiles, h, owp // 128, 128),
                                 jnp.float32),
            jax.ShapeDtypeStruct((4, 16, 4 * m), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * m), jnp.float32),
            jax.ShapeDtypeStruct((4, 4 * m, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=24 * bsz * n_tiles * (ho + 2) * 128 * (16 + c1) * 4 * m,
            bytes_accessed=2 * (xt.size + gt.size) * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(xt, gt, w0s, b0r[None], w1s, b1r[None], d, w1st, w0st, dtm)

    # stitch dx tiles back to the full-res plane (overlaps sum)
    if n_tiles == 1:
        dx = dxt[:, 0].reshape(bsz, h, owp)[:, :, :w]
    else:
        wpad = w + 8 * halo
        dxp = jnp.zeros((bsz, h, wpad), jnp.float32)
        for t in range(n_tiles):
            seg = dxt[:, t].reshape(bsz, h, owp)[:, :, :4 * twh]
            dxp = dxp.at[:, :, t * 4 * tw:t * 4 * tw + 4 * twh].add(seg)
        dx = dxp[:, :, 4 * halo:4 * halo + w]

    dw0, dw1 = _fold_weight_grads(dw0s, dw1s, m, c1)
    db0 = jnp.sum(db0r.reshape(4, m), axis=0)
    db1 = db1r[0]
    return dx.astype(xplane.dtype), dw0, db0, dw1, db1


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dep_encode_front_core(xplane, w0, b0, w1, b1, dt=jnp.float32):
    if not _use_pallas() or _too_serial(xplane.shape):
        return dep_encode_front_reference(
            xplane.astype(dt), w0, b0, w1, b1)
    return _fwd_pallas(xplane, w0, b0, w1, b1, dt)


def _vjp_fwd(xplane, w0, b0, w1, b1, dt):
    return _dep_encode_front_core(xplane, w0, b0, w1, b1, dt), \
        (xplane, w0, b0, w1, b1)


def _vjp_bwd(dt, res, g):
    xplane, w0, b0, w1, b1 = res
    if not _use_pallas() or _too_serial(xplane.shape):
        _, vjp = jax.vjp(
            lambda xp, *a: dep_encode_front_reference(xp.astype(dt), *a),
            xplane, w0, b0, w1, b1)
        return vjp(g)
    return _bwd_pallas(xplane, w0, b0, w1, b1, dt, g)


_dep_encode_front_core.defvjp(_vjp_fwd, _vjp_bwd)


def dep_encode_front(xplane, w0, b0, w1, b1, dt=jnp.float32):
    """Fused conv0+ReLU+conv1+ReLU (both Conv k3/s2/p1).

    xplane: (B, H, W) depth plane (H, W multiples of 4); w0: (3, 3, 1, M);
    w1: (3, 3, M, C1). Returns NHWC (B, H/4, W/4, C1) in dtype ``dt``.

    Under an ambient data mesh the kernel self-partitions over the batch
    (ops/pallas/shard.py); the per-shard core re-checks ``_too_serial``
    on its local batch and may fall back to the stock convs.
    """
    if not _use_pallas():
        return _dep_encode_front_core(xplane, w0, b0, w1, b1, dt)
    from nlspn_eccv20_tpu.ops.pallas.shard import shard_over_data

    return shard_over_data(
        lambda x, a0, c0, a1, c1: _dep_encode_front_core(x, a0, c0, a1, c1, dt),
        (xplane, w0, b0, w1, b1), (True, False, False, False, False))
