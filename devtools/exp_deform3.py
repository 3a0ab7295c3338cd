"""Prototype Pallas deformable-gather forward kernel.

Design: per (batch,) program, the zero-padded depth plane lives in VMEM;
for each neighbor the COLUMN coordinate is resolved EXACTLY by a Mosaic
lane-dimension gather (take_along_axis axis=-1, probed working in
exp_deform2), while the ROW coordinate is resolved by a static window of
sublane shifts (|off_y| <= radius). Compare vs windowed XLA and exact.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nlspn_eccv20_tpu.ops.propagate import (
    _neighbor_shifts,
    propagate_deformable_exact,
    propagate_deformable_windowed,
)
from bench import measure


def _kernel(p_ref, off_ref, aff_ref, out_ref, *, kernel, radius, h, w, rp):
    shifts = _neighbor_shifts(kernel)
    w2 = w + 2 * rp
    col_w = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    acc = jnp.zeros((h, w), jnp.float32)
    for ki, (dy, dx) in enumerate(shifts):
        ty = off_ref[0, 2 * ki] + dy
        tx = off_ref[0, 2 * ki + 1] + dx
        a = aff_ref[0, ki]
        x0f = jnp.floor(tx)
        fx = tx - x0f
        # gather operands must match the source block shape (h, w2): embed
        # the (h, w) per-pixel column indices at offset 0 and slice after.
        xi_w = jnp.floor(tx).astype(jnp.int32)  # (h, w)
        xi = jnp.concatenate(
            [col_w + xi_w + rp, jnp.zeros((h, 2 * rp), jnp.int32)], axis=1)
        neighk = jnp.zeros((h, w), jnp.float32)
        for u in range(dy - radius, dy + radius + 2):
            rowblk = p_ref[0, rp + u:rp + u + h, :]
            g0 = jnp.take_along_axis(rowblk, xi, axis=1)[:, :w]
            g1 = jnp.take_along_axis(rowblk, xi + 1, axis=1)[:, :w]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ty - u))
            neighk = neighk + wy * (g0 * (1.0 - fx) + g1 * fx)
        acc = acc + a * neighk
    out_ref[0] = acc


def deform_pallas(feat, offset, aff, kernel=3, radius=4, interpret=False):
    b, h, w, _ = feat.shape
    k2 = kernel * kernel
    rp = radius + 2  # fractional corner + kernel shift margin
    p = jnp.pad(feat[..., 0], ((0, 0), (rp, rp), (rp, rp)))
    offp = jnp.moveaxis(offset, -1, 1)  # (B, 2K2, H, W)
    affp = jnp.moveaxis(aff, -1, 1)

    kern = functools.partial(_kernel, kernel=kernel, radius=radius,
                             h=h, w=w, rp=rp)
    out = pl.pallas_call(
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
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(p, offp, affp)
    return out[..., None]


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for (b, h, w) in [(12, 228, 304), (1, 240, 1216)]:
        feat = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, h, w, 18)) * 1.5,
                          jnp.float32).clip(-4, 4)
        aff = jnp.asarray(rng.standard_normal((b, h, w, 9)) * 0.11,
                          jnp.float32)

        ref = propagate_deformable_exact(feat, off, aff)
        try:
            f = jax.jit(functools.partial(deform_pallas, radius=4))
            out = f(feat, off, aff)
            err = float(jnp.max(jnp.abs(out - ref)))
            t = measure(f, feat, off, aff)
            print(f"{b}x{h}x{w} pallas: max_err={err:.2e} fwd {t*1e6:.0f}us",
                  flush=True)
        except Exception as e:
            print(f"{b}x{h}x{w} pallas FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
        fw = jax.jit(functools.partial(propagate_deformable_windowed,
                                       radius=4))
        t = measure(fw, feat, off, aff)
        print(f"{b}x{h}x{w} xla-windowed: fwd {t*1e6:.0f}us", flush=True)


if __name__ == "__main__":
    main()
