"""Pallas TPU kernel: 3x3/s1 conv with few output channels, NHWC in,
PLANAR out — built for the prediction-heads stage-2 convolution.

STATUS: tested and numerically exact, but NOT wired into the model.
Measured in-model on v5e it LOSES to XLA's direct conv (+1.5 ms/step fp32,
+15 ms bf16 at NYU batch 12): the 9-tap fold is bound by VPU passes over
lane-padded (pixels, 128) vectors at full resolution, while XLA overlaps
its conv with the surrounding step. Kept as an op-library primitive and a
record of the measured outcome (standalone it beats the composed
concat+conv+moveaxis form: 5.4 ms vs 7.1 ms fwd at batch 12).

The fused heads (models/nlspn.Heads) end in one 3x3 conv from 256 channels
to ~10 (1 init-depth + num_neighbors affinities + 1 confidence). XLA pads
the 10-channel output to 128 lanes, so the stock conv runs at ~8 TFLOP/s /
180 GB/s and its fwd+bwd cost ~10.5 ms/step at NYU batch 12; the 10-channel
NHWC result is then moved to planar layouts by every consumer.

This kernel:
  * takes the stage-1 result and the encoder skip as TWO inputs (the
    256-channel concat is never materialized — the weight matrix splits),
  * computes all nine taps in ONE matmul per input ``Y9 = X @ W(C, 9*K)``
    over flat (pixels, channels) tiles — channels live in lanes, so plain
    NHWC rows merge into the pixel dim exactly,
  * assembles the output with nine statically-shifted adds (+bias), and
  * emits PLANAR (B, K, H, W) directly — pred/affinity/confidence consumers
    are all planar, so the NHWC->planar moves disappear.

Row tiling without data duplication: each grid step reads its row-block via
the main BlockSpec plus two single-row halo BlockSpecs of the same arrays
(clamped at the image edges and zeroed in-kernel), so HBM traffic is one
pass over the inputs. The backward (custom VJP) mirrors this: the planar
cotangent plus row halos come in, dX goes out NHWC per input with no
cross-tile stitching (each x row's gradient only needs g rows +-1, which
the halos provide); weight/bias grads accumulate across the sequential
grid. Deterministic.

Width handling: shifts are +-1 within flat rows; column-edge wraparound is
masked with an iota-mod-W predicate, so any W works (no 128 alignment
needed — lanes hold channels here, not pixels).
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
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# tap t = 3*(dy+1) + (dx+1); out[h, w] += K[t] @ x[h+dy, w+dx]
_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


FORCE_PALLAS_INTERPRET = False


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
# Pure-JAX reference
# ---------------------------------------------------------------------------

def small_conv3x3_reference(xa, xb, w, b):
    """conv3x3(concat(xa, xb)) + b -> planar (B, K, H, W)."""
    x = jnp.concatenate([xa, xb.astype(xa.dtype)], axis=-1)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.moveaxis(y + b.astype(x.dtype), -1, 1)


# ---------------------------------------------------------------------------
# Geometry / prep
# ---------------------------------------------------------------------------

def _pick_rows(h: int, w: int, ca: int, cb: int, k: int, per_px: int,
               vmem_budget: int = 40 * 2 ** 20) -> int:
    """Row-tile count: smallest divisor of h whose buffers fit VMEM.
    ``per_px``: f32 words of VMEM per pixel for the direction's buffers."""
    for nt in range(1, h + 1):
        if h % nt != 0:
            continue
        px = (h // nt + 2) * w
        if px * per_px * 4 <= vmem_budget:
            return nt
    return h


def _fold_mats(k, dt):
    """Fsum: (9k, k) sums the nine tap blocks; R = Fsum^T broadcasts a
    k-vector into all nine blocks."""
    f = np.zeros((9 * k, k), np.float32)
    for t in range(9):
        for c in range(k):
            f[t * k + c, c] = 1.0
    fj = jnp.asarray(f, dtype=dt)
    return fj, jnp.transpose(fj)


def _prep_w(w, ca, k, dt):
    """(3, 3, ca+cb, k) -> Wa (ca, 9k), Wb (cb, 9k)."""
    w9 = jnp.transpose(w.reshape(9, w.shape[2], k), (1, 0, 2))
    w9 = w9.reshape(w.shape[2], 9 * k)
    return w9[:ca].astype(dt), w9[ca:].astype(dt)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _flat_tile(main_ref, top_ref, bot_ref, t, n_tiles, th, w, c):
    """Concat halo rows around the row-block; zero halos at image edges."""
    top = jnp.where(t == 0, 0.0, top_ref[0, 0].astype(jnp.float32))
    bot = jnp.where(t == n_tiles - 1, 0.0, bot_ref[0, 0].astype(jnp.float32))
    x = jnp.pad(main_ref[0].astype(jnp.float32), ((1, 1), (0, 0), (0, 0)))
    x = x + jnp.pad(top[None], ((0, th + 1), (0, 0), (0, 0)))
    x = x + jnp.pad(bot[None], ((th + 1, 0), (0, 0), (0, 0)))
    return x.reshape((th + 2) * w, c)


def _edge_mask(npx, w, k, nk):
    """(npx, nk) multiplier zeroing tap-blocks whose +-1 column shift would
    wrap a row: dx=+1 blocks at col 0 (they are read by outputs at col w-1),
    dx=-1 blocks at col w-1. Applied ONCE to y9 — per-slice masks kept nine
    lane-padded temporaries live and blew VMEM."""
    col = jax.lax.broadcasted_iota(jnp.int32, (npx, nk), 0) % w
    tap = jax.lax.broadcasted_iota(jnp.int32, (npx, nk), 1) // k
    is_r = (tap % 3) == 2                        # dx = +1 taps
    is_l = (tap % 3) == 0                        # dx = -1 taps
    bad = (is_r & (col == 0)) | (is_l & (col == w - 1)) | (tap >= 9)
    return jnp.where(bad, 0.0, 1.0)


def _fwd_kernel(xa_ref, xat_ref, xab_ref, xb_ref, xbt_ref, xbb_ref,
                wa_ref, wb_ref, b_ref, f_ref, out_ref, *,
                th: int, w: int, ca: int, cb: int, k: int, n_tiles: int):
    t = pl.program_id(1)
    dt = out_ref.dtype
    npx = (th + 2) * w
    nk = f_ref.shape[1]
    xa = _flat_tile(xa_ref, xat_ref, xab_ref, t, n_tiles, th, w, ca)
    xb = _flat_tile(xb_ref, xbt_ref, xbb_ref, t, n_tiles, th, w, cb)
    y9 = _dot(xa.astype(dt), wa_ref[:]) + _dot(xb.astype(dt), wb_ref[:])
    y9 = y9 * _edge_mask(npx, w, k, 9 * k)
    y9 = jnp.pad(y9.astype(dt), ((w + 1, w + 1), (0, 0)))

    # Z[r, t*k+c] = y9[r + s_t, t*k+c] via lane-selected VPU adds — folding
    # each tap with an (., 128)@(128, k) matmul costs 12x the main matmul
    # (k pads to 128 lanes on the MXU) and dominated the kernel.
    tap_of_lane = jax.lax.broadcasted_iota(jnp.int32, (npx, 9 * k), 1) // k
    z = jnp.zeros((npx, 9 * k), jnp.float32)
    for ti, (dy, dx) in enumerate(_TAPS):
        s = dy * w + dx
        sl = y9[w + 1 + s:w + 1 + s + npx]
        z = z + jnp.where(tap_of_lane == ti, sl, 0.0)
    acc = _dot(z.astype(dt), f_ref[:]) + b_ref[:].astype(jnp.float32)
    out = acc.astype(dt).reshape(th + 2, w, k)[1:th + 1]   # (th, w, k)
    wp = out_ref.shape[3] * 128
    out = jnp.pad(out, ((0, 0), (0, wp - w), (0, 0)))
    out = jnp.transpose(out, (2, 0, 1))                    # (k, th, wp)
    out_ref[0] = out.reshape(k, th, wp // 128, 128)


def _bwd_kernel(xa_ref, xat_ref, xab_ref, xb_ref, xbt_ref, xbb_ref,
                g_ref, gt_ref, gb_ref, wa_t_ref, wb_t_ref, ft_ref,
                dxa_ref, dxb_ref, dw_ref, db_ref, *,
                th: int, w: int, ca: int, cb: int, k: int, n_tiles: int):
    t = pl.program_id(1)
    dt = dxa_ref.dtype
    npx = (th + 2) * w
    first = (pl.program_id(0) == 0) & (t == 0)

    # planar cotangent rows + halos -> flat (npx, k). g blocks are
    # (1, k, rows, wp//128, 128); unpad the lane dim then go rows-major.
    def g_rows(ref):
        kk, rows = ref.shape[1], ref.shape[2]
        wp = ref.shape[3] * 128
        gp = ref[0].reshape(kk, rows, wp)[:, :, :w]
        return jnp.transpose(gp, (1, 2, 0))                # (rows, w, k)

    gtop = jnp.where(t == 0, 0.0, g_rows(gt_ref).astype(jnp.float32))
    gbot = jnp.where(t == n_tiles - 1, 0.0,
                     g_rows(gb_ref).astype(jnp.float32))
    g = jnp.pad(g_rows(g_ref).astype(jnp.float32), ((1, 1), (0, 0), (0, 0)))
    g = g + jnp.pad(gtop, ((0, th + 1), (0, 0), (0, 0)))
    g = g + jnp.pad(gbot, ((th + 1, 0), (0, 0), (0, 0)))
    g = g.reshape(npx, k)

    # dY9[r, t*k+c] = g[r - s_t, c]: broadcast g into all blocks with one
    # matmul, then shift lane-selectively (VPU)
    g9 = _dot(g.astype(dt), ft_ref[:])                   # (npx, 9k)
    ge = jnp.pad(g9.astype(dt), ((w + 1, w + 1), (0, 0)))
    tap_of_lane = jax.lax.broadcasted_iota(jnp.int32, (npx, 9 * k), 1) // k
    dy9 = jnp.zeros((npx, 9 * k), jnp.float32)
    for ti, (dy, dx) in enumerate(_TAPS):
        s = dy * w + dx
        sl = ge[w + 1 - s:w + 1 - s + npx]
        dy9 = dy9 + jnp.where(tap_of_lane == ti, sl, 0.0)
    dy9 = (dy9 * _edge_mask(npx, w, k, 9 * k)).astype(dt)

    dxa = _dot(dy9, wa_t_ref[:]).astype(dt)                # (npx, ca)
    dxb = _dot(dy9, wb_t_ref[:]).astype(dt)
    dxa_ref[0] = dxa.reshape(th + 2, w, ca)[1:th + 1]
    dxb_ref[0] = dxb.reshape(th + 2, w, cb)[1:th + 1]

    # weight grads: contract over MAIN rows only (halo rows would double-
    # count across tiles) — zero dy9 outside the main row range.
    rows = jax.lax.broadcasted_iota(jnp.int32, (npx, 1), 0) // w
    main = (rows >= 1) & (rows <= th)
    dy9m = jnp.where(main, dy9.astype(jnp.float32), 0.0).astype(dt)
    xa = _flat_tile(xa_ref, xat_ref, xab_ref, t, n_tiles, th, w, ca)
    xb = _flat_tile(xb_ref, xbt_ref, xbb_ref, t, n_tiles, th, w, cb)
    dwa = _dot_t(xa.astype(dt), dy9m)                      # (ca, 9k)
    dwb = _dot_t(xb.astype(dt), dy9m)
    db = jnp.sum(jnp.where(main, g, 0.0), axis=0, keepdims=True)

    @pl.when(first)
    def _init():
        dw_ref[0] = dwa
        dw_ref[1] = jnp.pad(dwb, ((0, ca - cb), (0, 0))) if cb < ca else dwb
        db_ref[:] = db

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw_ref[0] = dw_ref[0] + dwa
        dw_ref[1] = dw_ref[1] + (jnp.pad(dwb, ((0, ca - cb), (0, 0)))
                                 if cb < ca else dwb)
        db_ref[:] = db_ref[:] + db


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _row_specs(h, th, w, c):
    """(main, top-halo, bottom-halo) BlockSpecs over one (B, H, W, C) array."""
    n_tiles = h // th
    main = pl.BlockSpec((1, th, w, c), lambda i, t: (i, t, 0, 0),
                        memory_space=pltpu.VMEM)
    # single-row blocks; clamp at the edges (zeroed in-kernel)
    top = pl.BlockSpec(
        (1, 1, w, c),
        lambda i, t: (i, jnp.maximum(t * th - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    bot = pl.BlockSpec(
        (1, 1, w, c),
        lambda i, t: (i, jnp.minimum((t + 1) * th, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    return main, top, bot


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i, t, _s=len(shape): (0,) * _s,
                        memory_space=pltpu.VMEM)


def _fwd_pallas(xa, xb, w, b):
    bsz, h, wd, ca = xa.shape
    cb = xb.shape[3]
    k = w.shape[3]
    dt = xa.dtype
    # per-pixel f32 words: xa + xb + y9(pad to 128 lanes) + acc + slack
    n_tiles = _pick_rows(h, wd, ca, cb, k,
                         ca + cb + max(9 * k, 128) + 4 * k + 64)
    th = h // n_tiles
    wpb = (wd + 127) // 128
    wa, wb = _prep_w(w, ca, k, dt)
    ma, ta, ba = _row_specs(h, th, wd, ca)
    mb, tb, bb = _row_specs(h, th, wd, cb)

    f, _ = _fold_mats(k, dt)
    kern = functools.partial(_fwd_kernel, th=th, w=wd, ca=ca, cb=cb, k=k,
                             n_tiles=n_tiles)
    out = pl.pallas_call(
        kern,
        grid=(bsz, n_tiles),
        in_specs=[ma, ta, ba, mb, tb, bb,
                  _full_spec((ca, 9 * k)), _full_spec((cb, 9 * k)),
                  _full_spec((1, k)), _full_spec((9 * k, k))],
        out_specs=pl.BlockSpec((1, k, th, wpb, 128),
                               lambda i, t: (i, 0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, k, h, wpb, 128), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * (ca + cb) * 9 * k,
            bytes_accessed=(xa.size + xb.size + bsz * k * h * wd)
            * xa.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xa, xa, xa, xb, xb, xb, wa, wb, b.astype(dt)[None], f)
    return out.reshape(bsz, k, h, wpb * 128)[..., :wd]


def _bwd_pallas(xa, xb, w, b, g):
    bsz, h, wd, ca = xa.shape
    cb = xb.shape[3]
    k = w.shape[3]
    dt = xa.dtype
    # per-pixel f32 words: xa + xb + dxa + dxb + dy9(128 lanes) + g + slack
    n_tiles = _pick_rows(h, wd, ca, cb, k,
                         2 * (ca + cb) + max(9 * k, 128) + 4 * k + 64)
    th = h // n_tiles
    wpb = (wd + 127) // 128
    wa, wb = _prep_w(w, ca, k, dt)
    wat = jnp.transpose(wa)
    wbt = jnp.transpose(wb)
    ma, ta, ba = _row_specs(h, th, wd, ca)
    mb, tb, bb = _row_specs(h, th, wd, cb)
    g = jnp.pad(g.astype(dt), ((0, 0), (0, 0), (0, 0), (0, wpb * 128 - wd)))
    g = g.reshape(bsz, k, h, wpb, 128)
    gm = pl.BlockSpec((1, k, th, wpb, 128), lambda i, t: (i, 0, t, 0, 0),
                      memory_space=pltpu.VMEM)
    gt = pl.BlockSpec((1, k, 1, wpb, 128),
                      lambda i, t: (i, 0, jnp.maximum(t * th - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    gb = pl.BlockSpec((1, k, 1, wpb, 128),
                      lambda i, t: (i, 0, jnp.minimum((t + 1) * th, h - 1),
                                    0, 0),
                      memory_space=pltpu.VMEM)

    _, ft = _fold_mats(k, dt)
    kern = functools.partial(_bwd_kernel, th=th, w=wd, ca=ca, cb=cb, k=k,
                             n_tiles=n_tiles)
    dxa, dxb, dwp, dbr = pl.pallas_call(
        kern,
        grid=(bsz, n_tiles),
        in_specs=[ma, ta, ba, mb, tb, bb, gm, gt, gb,
                  _full_spec((9 * k, ca)), _full_spec((9 * k, cb)),
                  _full_spec((k, 9 * k))],
        out_specs=[
            pl.BlockSpec((1, th, wd, ca), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wd, cb), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((2, ca, 9 * k)), _full_spec((1, k)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wd, ca), dt),
            jax.ShapeDtypeStruct((bsz, h, wd, cb), dt),
            jax.ShapeDtypeStruct((2, ca, 9 * k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * h * wd * (ca + cb) * 9 * k,
            bytes_accessed=2 * (xa.size + xb.size) * xa.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xa, xa, xa, xb, xb, xb, g, g, g, wat, wbt, ft)

    dwa = dwp[0]                                          # (ca, 9k)
    dwb = dwp[1, :cb]                                     # (cb, 9k)
    dw = jnp.concatenate([dwa, dwb], axis=0).reshape(ca + cb, 9, k)
    dw = jnp.transpose(dw, (1, 0, 2)).reshape(3, 3, ca + cb, k)
    return dxa, dxb, dw, dbr[0]


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _small_conv3x3_core(xa, xb, w, b):
    if not _use_pallas():
        return small_conv3x3_reference(xa, xb, w, b)
    return _fwd_pallas(xa, xb, w, b)


def _vjp_fwd(xa, xb, w, b):
    return _small_conv3x3_core(xa, xb, w, b), (xa, xb, w, b)


def _vjp_bwd(res, g):
    xa, xb, w, b = res
    if not _use_pallas():
        _, vjp = jax.vjp(small_conv3x3_reference, xa, xb, w, b)
        return vjp(g)
    return _bwd_pallas(xa, xb, w, b, g)


_small_conv3x3_core.defvjp(_vjp_fwd, _vjp_bwd)


def small_conv3x3_planar(xa, xb, w, b):
    """3x3/s1 conv over concat(xa, xb) with few outputs, planar result.

    xa: (B, H, W, Ca); xb: (B, H, W, Cb); w: (3, 3, Ca+Cb, K); b: (K,).
    Returns (B, K, H, W) in xa.dtype. The channel concat never
    materializes (the weight matrix splits row-wise).

    Under an ambient data mesh the kernel self-partitions over the batch
    (ops/pallas/shard.py).
    """
    if not _use_pallas():
        return _small_conv3x3_core(xa, xb, w, b)
    from nlspn_eccv20_tpu.ops.pallas.shard import shard_over_data

    return shard_over_data(_small_conv3x3_core, (xa, xb, w, b),
                           (True, True, False, False))
