"""Probe Mosaic gather support + prototype windowed deformable gather.

The take_along_axis formulation measured 308ms/step at NYU b=12 (exp_deform).
Candidates:
  1. Pallas kernel with jnp.take_along_axis inside (does Mosaic lower it?)
  2. pure-XLA windowed shift-and-select (exact when |offset| <= R)
Run with python -u (TPU compiles are slow; output must stream).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.ops.propagate import propagate_deformable, _neighbor_shifts
from bench import measure


def probe_mosaic_gather():
    from jax.experimental import pallas as pl

    x = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 64, (64, 128)),
                      jnp.int32)
    for axis in (0, 1):
        def kern(x_ref, idx_ref, o_ref, axis=axis):
            o_ref[:] = jnp.take_along_axis(
                x_ref[:], idx_ref[:] % x_ref.shape[axis], axis=axis)
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
            )(x, idx)
            ref = jnp.take_along_axis(x, idx % x.shape[axis], axis=axis)
            print(f"mosaic take_along_axis(axis={axis}): OK, match:",
                  bool(jnp.allclose(out, ref)), flush=True)
        except Exception as e:
            print(f"mosaic take_along_axis(axis={axis}) failed:",
                  type(e).__name__, str(e)[:160], flush=True)


def windowed_deform(feat, offset, aff, kernel=3, radius=4):
    """Exact deformable gather when every learned offset is in [-radius, radius]."""
    b, h, w, _ = feat.shape
    k2 = kernel * kernel
    off = offset.reshape(b, h, w, k2, 2)
    shifts = _neighbor_shifts(kernel)
    rp = radius + 2  # kernel shift 1 + ceil corner 1
    p = jnp.pad(feat[..., 0], ((0, 0), (rp, rp), (rp, rp)))

    out = jnp.zeros((b, h, w), feat.dtype)
    for ki, (dy, dx) in enumerate(shifts):
        ty = off[..., ki, 0] + dy
        tx = off[..., ki, 1] + dx
        a = aff[..., ki]
        us = range(dy - radius, dy + radius + 2)
        vs = range(dx - radius, dx + radius + 2)
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    probe_mosaic_gather()

    rng = np.random.default_rng(0)
    for (b, h, w) in [(12, 228, 304), (1, 240, 1216)]:
        feat = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
        off = jnp.asarray(rng.standard_normal((b, h, w, 18)) * 1.5,
                          jnp.float32).clip(-4, 4)
        aff = jnp.asarray(rng.standard_normal((b, h, w, 9)) * 0.11, jnp.float32)

        ref = propagate_deformable(feat, off, aff)
        for radius in (4,):
            f = jax.jit(functools.partial(windowed_deform, radius=radius))
            outw = f(feat, off, aff)
            err = float(jnp.max(jnp.abs(outw - ref)))
            t = measure(f, feat, off, aff)
            print(f"{b}x{h}x{w} R={radius}: max_err={err:.2e} "
                  f"fwd {t*1e6:.0f}us", flush=True)

        def loss(f_, o_, a_):
            out = windowed_deform(f_, o_, a_, radius=4)
            return jnp.sum(out * out)
        gradf = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t = measure(gradf, feat, off, aff)
        print(f"{b}x{h}x{w} R=4: fwd+bwd {t*1e6:.0f}us", flush=True)


if __name__ == "__main__":
    main()
