"""Fused Pallas TPU kernel for the decode_aff tail: deconv1 + ReLU + deconv2.

The reference affinity decoder (/root/reference/src/model/nlspnmodel.py:140-144)
upsamples the GRU hidden state with three stride-2 transposed convolutions;
it runs once per propagation iteration (11x per train step at the fork
default ``prop_time=12``). The last two deconvs have 16 and ``num_neighbors``
output channels — tensors XLA lays out with the channel dim padded to 128
lanes, so the stock lowering is ~8x memory-amplified and runs at <1 TFLOP/s
(device profile: deconv2 alone costs 17.8 ms/step fwd+bwd at NYU batch 12).

This kernel fuses ``deconv2(relu(deconv1(x)))`` so the 16-channel
intermediate never leaves VMEM, and re-expresses both stride-2 transposed
convs as dense MXU matmuls via *phase decomposition*:

With the pre-flipped kernel storage used by ``models/common.ConvTranspose``
(lhs-dilated convention), a 1-D k=3/s=2/p=1/op=1 transposed conv splits into
two output phases::

    out[2i]   = K[1] @ x[i]
    out[2i+1] = K[0] @ x[i] + K[2] @ x[i+1]

Applying this per axis, deconv1's four phases and deconv2's sixteen
composite phases (a 4x4 pixel decimation of the final output) are linear
maps of x evaluated at grid shifts in {0,1}^2. The kernel works on a flat
(pixels, channels) matrix — image rows padded to 128 columns with one zero
guard row-block above and below — so a grid shift (sy, sx) is a flat
sublane shift of sy*128+sx. Both deconvs then reduce to FOUR wide matmuls
each (one per distinct shift), with the tap-to-phase placement baked into
pre-arranged weight matrices::

    P   = relu( sum_s shift_s(X @ W1S[s]) + b1 )   # (pixels, 4 phases x M)
    OUT =       sum_s shift_s(P @ W2S[s]) + b2     # (pixels, 16 phases x K)

(Shifted terms accumulate into a canonically-laid-out zero accumulator —
the one composition pattern Mosaic relayouts reliably; narrow-slice
concatenation is avoided entirely.) Finally the 16 output phases are
interleaved back to planar (K, 4Hg, 4Wg): columns via an MXU one-hot
expansion matmul (grid col j -> output col 4j+b), rows via sublane-strided
stores (out[c, a::4] — legal because the output block's minor dim is
exactly 128).

The backward pass is the exact transpose in one kernel: de-interleave the
cotangent with strided loads + E^T matmuls, run the four shift-matmuls in
reverse, and accumulate weight/bias grads across the sequential grid.
Deterministic (pure gathers/matmuls — the reference's CUDA backward uses
atomicAdd, SURVEY.md section 5).

Matmul precision: f32 operands use HIGHEST (full f32; measured 1.6e-7 vs a
float64 oracle — the stock XLA conv path multiplies in one bf16 pass and
sits at 3.6e-3); bf16 operands use the native single pass.

Width tiling: grids wider than 126 columns are split into TW-column tiles
with a 1-column halo (the composed op's receptive field on the base grid
is +1). NYU (58, 76) is a single tile; KITTI (60, 304) uses four.

Numerical semantics match ``ConvTranspose`` exactly (same pre-flipped
storage, zero padding); machine-checked against the pure-JAX composition
in tests/test_dec_aff_tail.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

# 1-D phase rules for k=3/s2/p1/op1 with pre-flipped kernel storage:
# out[2i + phase] = sum over (tap, shift): K[tap] @ x[i + shift]
_RULES = {0: ((1, 0),), 1: ((0, 0), (2, 1))}
_SHIFTS = ((0, 0), (0, 1), (1, 0), (1, 1))          # (row, col) grid shifts


def _deconv1_placement():
    """[(phase p, tap9, shift_index)] — unique (p, shift) pairs."""
    out = []
    for py in range(2):
        for px in range(2):
            for ty, sy in _RULES[py]:
                for tx, sx in _RULES[px]:
                    out.append((2 * py + px, 3 * ty + tx,
                                _SHIFTS.index((sy, sx))))
    return out


def _deconv2_placement():
    """[(out_phase ab, in_phase p2, tap9 t2, shift_index)] for the composed
    deconv2-over-deconv1 map; unique (ab, p2, shift) triples."""
    out = []
    for py in range(2):
        for qy in range(2):
            a = 2 * py + qy
            for px in range(2):
                for qx in range(2):
                    b = 2 * px + qx
                    for t2y, s2y in _RULES[qy]:
                        p2y, gy = (py + s2y) % 2, (py + s2y) // 2
                        for t2x, s2x in _RULES[qx]:
                            p2x, gx = (px + s2x) % 2, (px + s2x) // 2
                            out.append((4 * a + b, 2 * p2y + p2x,
                                        3 * t2y + t2x,
                                        _SHIFTS.index((gy, gx))))
    return out


def _pick_tiles(wg: int) -> Tuple[int, int, int]:
    """(n_tiles, tile_cols, halo). Single tile when the grid fits 128 lanes."""
    if wg <= 126:
        return 1, wg, 0
    for tw in range(125, 0, -1):
        if wg % tw == 0:
            return wg // tw, tw, 1
    raise ValueError(f"cannot tile base-grid width {wg}")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Pure-JAX reference (CPU fallback + VJP ground truth)
# ---------------------------------------------------------------------------

def _deconv(x, w, b):
    """ConvTranspose2d(k3, s2, p1, op1) with pre-flipped kernel storage —
    exactly models/common.ConvTranspose (common.py:83-138)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def decode_aff_tail_reference(x, w1, b1, w2, b2):
    """deconv2(relu(deconv1(x))) -> planar (B, K, 4Hg, 4Wg)."""
    y1 = jax.nn.relu(_deconv(x, w1, b1))
    y2 = _deconv(y1, w2, b2)
    return jnp.moveaxis(y2, -1, 1)


# ---------------------------------------------------------------------------
# Weight / constant prep (XLA side; all tensors are tiny)
# ---------------------------------------------------------------------------

def _prep_weights(w1, b1, w2, b2, dt):
    """Shift-indexed placement matrices W1S (4, C, 4M), W2S (4, 4M, 16K)."""
    c, m = w1.shape[2], w1.shape[3]
    k = w2.shape[3]
    w1f = w1.reshape(9, c, m)
    w2f = w2.reshape(9, m, k)
    w1s = jnp.zeros((4, c, 4 * m), w1.dtype)
    for p, tap, si in _deconv1_placement():
        w1s = w1s.at[si, :, p * m:(p + 1) * m].set(w1f[tap])
    w2s = jnp.zeros((4, 4 * m, 16 * k), w2.dtype)
    for ab, p2, t2, si in _deconv2_placement():
        w2s = w2s.at[si, p2 * m:(p2 + 1) * m,
                     ab * k:(ab + 1) * k].set(w2f[t2])
    return (w1s.astype(dt), jnp.tile(b1, 4).astype(dt),
            w2s.astype(dt), jnp.tile(b2, 16).astype(dt))


def _fold_weight_grads(dw1s, dw2s, c, m, k):
    """Fold shift-placement grads back to (3,3,C,M) / (3,3,M,K)."""
    dw1f = jnp.zeros((9, c, m), jnp.float32)
    for p, tap, si in _deconv1_placement():
        dw1f = dw1f.at[tap].add(dw1s[si, :, p * m:(p + 1) * m])
    dw2f = jnp.zeros((9, m, k), jnp.float32)
    for ab, p2, t2, si in _deconv2_placement():
        dw2f = dw2f.at[t2].add(dw2s[si, p2 * m:(p2 + 1) * m,
                                    ab * k:(ab + 1) * k])
    return dw1f.reshape(3, 3, c, m), dw2f.reshape(3, 3, m, k)


def _expand_mats(tw: int, halo: int, owp: int):
    """E[b]: (128, owp) one-hot mapping local grid col halo+j -> out col 4j+b."""
    e = np.zeros((4, 128, owp), np.float32)
    for b in range(4):
        for j in range(tw):
            e[b, halo + j, 4 * j + b] = 1.0
    return jnp.asarray(e)


# Set by tests to exercise the Pallas path in interpreter mode on CPU.
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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# In-kernel MXU precision. DEFAULT multiplies in one bf16 pass with f32
# accumulation — the SAME numerics the stock XLA conv lowering used for
# these layers on TPU, at 6x the HIGHEST (bf16x6) throughput; HIGHEST made
# the fused train step slower than the XLA path it replaces. Tests can set
# MATMUL_PRECISION = "highest" to validate the kernel algebra at 1e-7
# (pinned against a float64 oracle + finite differences in
# tests/test_dec_aff_tail.py and the TPU validation runs).
MATMUL_PRECISION = "default"


def _prec():
    return (jax.lax.Precision.HIGHEST if MATMUL_PRECISION == "highest"
            else jax.lax.Precision.DEFAULT)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_prec())


def _dot_t(a, b):
    """a^T @ b contraction over dim 0."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_prec())


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------

def _flat_input(x_ref, hg, twh, c, nr):
    """(hg, twh, c) block -> zero-guarded flat (nr, c) pixel matrix."""
    x = x_ref[0, 0]
    xp = jnp.pad(x, ((1, 1), (0, 128 - twh), (0, 0)))
    return xp.reshape(nr, c)


def _valid_mask(t, nr, tw, halo, twh, hg, n_tiles):
    """True on pixels inside the image; guard blocks / 128-pad / edge-tile
    halo columns are outside (their true deconv output is zero, not bias)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0) // 128
    cols = jax.lax.broadcasted_iota(jnp.int32, (nr, 1), 0) % 128
    lo = jnp.where(t == 0, halo, 0)
    hi = jnp.where(t == n_tiles - 1, halo + tw, twh)
    return (rows >= 1) & (rows <= hg) & (cols >= lo) & (cols < hi)


def _shift_matmul_sum(xf, ws_ref, nr, width, dt):
    """sum_s shift_s(xf @ WS[s]) — canonical accumulator, f32 accumulation."""
    acc = jnp.zeros((nr, width), jnp.float32)
    for si, (sy, sx) in enumerate(_SHIFTS):
        z = _dot(xf, ws_ref[si])
        zp = jnp.pad(z, ((0, 130), (0, 0)))
        s = sy * 128 + sx
        acc = acc + zp[s:s + nr]
    return acc


def _unshift_matmul_sum(g, ws_t_ref, nr, width, dt):
    """sum_s (shift_s)^T(g) @ WS[s]^T for the backward direction."""
    ge = jnp.pad(g, ((130, 0), (0, 0)))
    acc = jnp.zeros((nr, width), jnp.float32)
    for si, (sy, sx) in enumerate(_SHIFTS):
        s = sy * 128 + sx
        acc = acc + _dot(ge[130 - s:130 - s + nr], ws_t_ref[si])
    return acc


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w1s_ref, b1_ref, w2s_ref, b2_ref, e_ref, out_ref, *,
                hg: int, twh: int, tw: int, halo: int, owp: int, c: int,
                m: int, k: int, n_tiles: int):
    nr = (hg + 2) * 128
    t = pl.program_id(1)
    dt = x_ref.dtype

    xf = _flat_input(x_ref, hg, twh, c, nr)
    valid = _valid_mask(t, nr, tw, halo, twh, hg, n_tiles)

    # masks/ReLU in f32: bf16 vector compares are unsupported on v5e
    pmat_f32 = _shift_matmul_sum(xf, w1s_ref, nr, 4 * m, dt) \
        + b1_ref[:].astype(jnp.float32)
    pmat_f32 = jnp.where(valid, jnp.maximum(pmat_f32, 0.0), 0.0)
    pmat = pmat_f32.astype(dt)

    out = _shift_matmul_sum(pmat, w2s_ref, nr, 16 * k, dt) + b2_ref[:]
    outt = out.astype(dt).T                                  # (16k, nr)

    # interleave the 16 phases to planar via lane-expansion matmuls +
    # sublane-strided stores
    for a in range(4):
        rows_a = None
        for b in range(4):
            blk = outt[(a * 4 + b) * k:(a * 4 + b + 1) * k]  # (k, nr)
            blk = blk.reshape(k, hg + 2, 128)[:, 1:hg + 1]   # (k, hg, 128)
            blk = blk.reshape(k * hg, 128)
            r = _dot(blk, e_ref[b].astype(dt))               # (k*hg, owp)
            rows_a = r if rows_a is None else rows_a + r
        # strided stores support only 32-bit data -> planar side stays f32
        rows5 = rows_a.reshape(k * hg, owp // 128, 128)
        for ch in range(k):
            out_ref[0, 0, ch, a::4] = rows5[ch * hg:(ch + 1) * hg]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _deint_kernel(g_ref, et_ref, gflat_ref, *, hg: int, owp: int, k: int):
    """De-interleave the planar cotangent to the flat (pixels, 16K) layout:
    sublane-strided loads undo the row interleave, E^T matmuls undo the
    column interleave. Runs as its OWN pallas_call, keeping the main
    backward kernel's VMEM peak low enough for KITTI-sized tiles."""
    nr = (hg + 2) * 128
    gt_rows = []
    for a in range(4):
        ga = None
        for ch in range(k):
            piece = g_ref[0, 0, ch, a::4].reshape(hg, owp)
            piece = jnp.pad(piece, ((ch * hg, (k - ch - 1) * hg), (0, 0)))
            ga = piece if ga is None else ga + piece          # (k*hg, owp)
        for b in range(4):
            gab = _dot(ga, et_ref[b])                         # (k*hg, 128)
            gab = gab.reshape(k, hg, 128)
            gab = jnp.pad(gab, ((0, 0), (1, 1), (0, 0))).reshape(k, nr)
            gt_rows.append(gab)
    g = None
    for i, piece in enumerate(gt_rows):                       # (16k, nr)
        piece = jnp.pad(piece, ((i * k, (15 - i) * k), (0, 0)))
        g = piece if g is None else g + piece
    gflat_ref[0, 0] = g.T                                     # (nr, 16k)


def _bwd_kernel(x_ref, g_ref, w1s_ref, b1_ref, w2s_t_ref, w1s_t_ref,
                dx_ref, dw1s_ref, dw2s_ref, db1_ref, db2_ref, *,
                hg: int, twh: int, tw: int, halo: int, owp: int, c: int,
                m: int, k: int, n_tiles: int):
    nr = (hg + 2) * 128
    t = pl.program_id(1)
    dt = x_ref.dtype
    first = (pl.program_id(0) == 0) & (t == 0)
    g = g_ref[0, 0].astype(dt)                                # (nr, 16k)

    # --- recompute P (cheaper than spilling it to HBM) ---
    xf = _flat_input(x_ref, hg, twh, c, nr)
    valid = _valid_mask(t, nr, tw, halo, twh, hg, n_tiles)
    pmat_f32 = _shift_matmul_sum(xf, w1s_ref, nr, 4 * m, dt) \
        + b1_ref[:].astype(jnp.float32)
    pmat_f32 = jnp.where(valid, jnp.maximum(pmat_f32, 0.0), 0.0)
    pmat = pmat_f32.astype(dt)

    # --- dP with relu mask (f32 compare: bf16 compares unsupported) ---
    dp = _unshift_matmul_sum(g, w2s_t_ref, nr, 4 * m, dt)
    dp = jnp.where(pmat_f32 > 0, dp, 0.0).astype(dt)          # (nr, 4m)

    # --- dx ---
    dx = _unshift_matmul_sum(dp, w1s_t_ref, nr, c, dt)
    dx = dx.astype(dt).reshape(hg + 2, 128, c)[1:hg + 1, :twh]
    dx_ref[0, 0] = dx

    # --- weight/bias grads, accumulated across the sequential grid ---
    # dW2S[s] = shift_s(P)^T @ G. Verified against float64 finite
    # differences on TPU: the XLA VJP of the reference composition under
    # default_matmul_precision('highest') returns a WRONG dw2 on this
    # stack, so reference-gradient comparisons for dw2 are only meaningful
    # at DEFAULT precision / small sizes (see tests).
    dpe = jnp.pad(dp, ((130, 0), (0, 0)))
    pme = jnp.pad(pmat, ((0, 130), (0, 0)))
    dw1s, dw2s = [], []
    for si, (sy, sx) in enumerate(_SHIFTS):
        s = sy * 128 + sx
        dw1s.append(_dot_t(xf, dpe[130 - s:130 - s + nr]))
        dw2s.append(_dot_t(pme[s:s + nr], g))
    db1 = jnp.sum(dp.astype(jnp.float32), axis=0, keepdims=True)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(first)
    def _init():
        for si in range(4):
            dw1s_ref[si] = dw1s[si]
            dw2s_ref[si] = dw2s[si]
        db1_ref[:] = db1
        db2_ref[:] = db2

    @pl.when(jnp.logical_not(first))
    def _acc():
        for si in range(4):
            dw1s_ref[si] = dw1s_ref[si] + dw1s[si]
            dw2s_ref[si] = dw2s_ref[si] + dw2s[si]
        db1_ref[:] = db1_ref[:] + db1
        db2_ref[:] = db2_ref[:] + db2


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _tile_x(x, n_tiles, tw, halo):
    if n_tiles == 1:
        return x[:, None]
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0)))
    return jnp.stack([xp[:, :, t * tw:t * tw + tw + 2 * halo]
                      for t in range(n_tiles)], axis=1)


def _geom(x_shape):
    bsz, hg, wg, c = x_shape
    n_tiles, tw, halo = _pick_tiles(wg)
    twh = tw + 2 * halo
    owp = _round_up(4 * tw, 128)
    return bsz, hg, wg, c, n_tiles, tw, halo, twh, owp


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i, t, _s=len(shape): (0,) * _s,
                        memory_space=pltpu.VMEM)


def _fwd_pallas(x, w1, b1, w2, b2):
    bsz, hg, wg, c, n_tiles, tw, halo, twh, owp = _geom(x.shape)
    m, k = w1.shape[3], w2.shape[3]
    dt = x.dtype
    w1s, b1r, w2s, b2r = _prep_weights(w1, b1, w2, b2, dt)
    e = _expand_mats(tw, halo, owp)
    xt = _tile_x(x, n_tiles, tw, halo)

    kern = functools.partial(
        _fwd_kernel, hg=hg, twh=twh, tw=tw, halo=halo, owp=owp, c=c, m=m,
        k=k, n_tiles=n_tiles)
    out6 = pl.pallas_call(
        kern,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, hg, twh, c), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((4, c, 4 * m)), _full_spec((1, 4 * m)),
            _full_spec((4, 4 * m, 16 * k)), _full_spec((1, 16 * k)),
            _full_spec((4, 128, owp)),
        ],
        out_specs=pl.BlockSpec((1, 1, k, 4 * hg, owp // 128, 128),
                               lambda i, t: (i, t, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, n_tiles, k, 4 * hg, owp // 128, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=8 * bsz * n_tiles * (hg + 2) * 128 * (c + 16 * k) * 4 * m,
            bytes_accessed=(xt.size + bsz * n_tiles * k * 4 * hg * owp)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xt, w1s, b1r[None], w2s, b2r[None], e)

    out = out6.astype(dt).reshape(bsz, n_tiles, k, 4 * hg, owp)
    if n_tiles == 1:
        return out[:, 0, :, :, :4 * wg]
    return jnp.concatenate([out[:, t, :, :, :4 * tw]
                            for t in range(n_tiles)], axis=-1)


def _bwd_pallas(x, w1, b1, w2, b2, g):
    bsz, hg, wg, c, n_tiles, tw, halo, twh, owp = _geom(x.shape)
    m, k = w1.shape[3], w2.shape[3]
    dt = x.dtype
    w1s, b1r, w2s, _ = _prep_weights(w1, b1, w2, b2, dt)
    e = _expand_mats(tw, halo, owp)
    et = jnp.transpose(e, (0, 2, 1))
    w2st = jnp.transpose(w2s, (0, 2, 1))
    w1st = jnp.transpose(w1s, (0, 2, 1))
    xt = _tile_x(x, n_tiles, tw, halo)

    g = g.astype(jnp.float32)      # strided loads support only 32-bit data
    if n_tiles == 1:
        gt = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, owp - 4 * wg)))[:, None]
    else:
        gt = jnp.stack(
            [jnp.pad(g[..., t * 4 * tw:(t + 1) * 4 * tw],
                     ((0, 0), (0, 0), (0, 0), (0, owp - 4 * tw)))
             for t in range(n_tiles)], axis=1)
    gt = gt.reshape(bsz, n_tiles, k, 4 * hg, owp // 128, 128)

    nr = (hg + 2) * 128
    gflat = pl.pallas_call(
        functools.partial(_deint_kernel, hg=hg, owp=owp, k=k),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, k, 4 * hg, owp // 128, 128),
                         lambda i, t: (i, t, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((4, owp, 128)),
        ],
        out_specs=pl.BlockSpec((1, 1, nr, 16 * k),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles, nr, 16 * k),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_tiles * 16 * k * hg * owp * 128,
            bytes_accessed=2 * gt.size * 4,
            transcendentals=0),
        interpret=_interpret(),
    )(gt, et)

    kern = functools.partial(
        _bwd_kernel, hg=hg, twh=twh, tw=tw, halo=halo, owp=owp, c=c, m=m,
        k=k, n_tiles=n_tiles)
    dxt, dw1s, dw2s, db1r, db2r = pl.pallas_call(
        kern,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, hg, twh, c), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nr, 16 * k), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((4, c, 4 * m)), _full_spec((1, 4 * m)),
            _full_spec((4, 16 * k, 4 * m)), _full_spec((4, 4 * m, c)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, hg, twh, c), lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            _full_spec((4, c, 4 * m)), _full_spec((4, 4 * m, 16 * k)),
            _full_spec((1, 4 * m)), _full_spec((1, 16 * k)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, n_tiles, hg, twh, c), dt),
            jax.ShapeDtypeStruct((4, c, 4 * m), jnp.float32),
            jax.ShapeDtypeStruct((4, 4 * m, 16 * k), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * m), jnp.float32),
            jax.ShapeDtypeStruct((1, 16 * k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 2 ** 20),
        interpret=_interpret(),
    )(xt, gflat, w1s, b1r[None], w2st, w1st)

    # stitch dx tiles (overlapping halos sum)
    if n_tiles == 1:
        dx = dxt[:, 0]
    else:
        dxp = jnp.zeros((bsz, hg, wg + 2 * halo, c), dt)
        for t in range(n_tiles):
            dxp = dxp.at[:, :, t * tw:t * tw + twh].add(dxt[:, t])
        dx = dxp[:, :, halo:halo + wg]

    dw1, dw2 = _fold_weight_grads(dw1s, dw2s, c, m, k)
    db1 = jnp.sum(db1r.reshape(4, m), axis=0)
    db2 = jnp.sum(db2r.reshape(16, k), axis=0)
    return dx, dw1, db1, dw2, db2


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _decode_aff_tail_core(x, w1, b1, w2, b2):
    if not _use_pallas():
        return decode_aff_tail_reference(x, w1, b1, w2, b2)
    return _fwd_pallas(x, w1, b1, w2, b2)


def _vjp_fwd(x, w1, b1, w2, b2):
    return _decode_aff_tail_core(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _vjp_bwd(res, g):
    x, w1, b1, w2, b2 = res
    if not _use_pallas():
        _, vjp = jax.vjp(decode_aff_tail_reference, x, w1, b1, w2, b2)
        return vjp(g)
    return _bwd_pallas(x, w1, b1, w2, b2, g)


_decode_aff_tail_core.defvjp(_vjp_fwd, _vjp_bwd)


def decode_aff_tail(x, w1, b1, w2, b2):
    """Fused deconv1+ReLU+deconv2 (both ConvTranspose k3/s2/p1/op1).

    x: (B, Hg, Wg, C) NHWC; w1: (3, 3, C, M) pre-flipped; b1: (M,);
    w2: (3, 3, M, K) pre-flipped; b2: (K,). Returns planar
    (B, K, 4Hg, 4Wg). Weights/biases are f32 params; compute runs in
    x.dtype with f32 MXU accumulation.

    Under an ambient data mesh the kernel self-partitions over the batch
    (ops/pallas/shard.py) — without this GSPMD would all-gather and
    replicate the custom call on every device.
    """
    if not _use_pallas():
        return _decode_aff_tail_core(x, w1, b1, w2, b2)
    from nlspn_eccv20_tpu.ops.pallas.shard import shard_over_data

    return shard_over_data(_decode_aff_tail_core, (x, w1, b1, w2, b2),
                           (True, False, False, False, False))
