"""Experiment: space-to-depth reformulation of stride-2 (de)convs.

Validates numerics against the direct lax formulation and measures fwd /
fwd+bwd device time for the hot GRU-loop shapes. Dev tool.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nlspn_eccv20_tpu.utils.device_time import median_device_time_s  # noqa: E402


def convt_direct(x, kk):
    # ConvTranspose(k3 s2 p1 op1), pre-flipped kernel, as in models/common.py
    return jax.lax.conv_general_dilated(
        x, kk, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def convt_s2d_kernel(kk):
    """(3,3,Ci,Co) pre-flipped -> dense (2,2,Ci,4*Co), pad ((0,1),(0,1))."""
    ci, co = kk.shape[2], kk.shape[3]
    w2 = jnp.zeros((2, 2, ci, 4 * co), kk.dtype)
    # per-dim valid (t, a, dk): (0,0,1), (0,1,0), (1,1,2)
    dim_map = [(0, 0, 1), (0, 1, 0), (1, 1, 2)]
    for th, a, dkh in dim_map:
        for tw, b, dkw in dim_map:
            ph = a * 2 + b
            w2 = w2.at[th, tw, :, ph * co:(ph + 1) * co].set(kk[dkh, dkw])
    return w2


def convt_s2d(x, kk):
    b, h, w, ci = x.shape
    co = kk.shape[3]
    w2 = convt_s2d_kernel(kk)
    y = jax.lax.conv_general_dilated(
        x, w2, (1, 1), ((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, h, w, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, co)


def conv_direct(x, kk):
    return jax.lax.conv_general_dilated(
        x, kk, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2d_kernel(kk):
    """(3,3,Ci,Co) -> dense (2,2,4*Ci,Co), pad ((1,0),(1,0))."""
    ci, co = kk.shape[2], kk.shape[3]
    w2 = jnp.zeros((2, 2, 4 * ci, co), kk.dtype)
    # per-dim valid (t, a, dk): (0,1,0), (1,0,1), (1,1,2)
    dim_map = [(0, 1, 0), (1, 0, 1), (1, 1, 2)]
    for th, a, dkh in dim_map:
        for tw, b, dkw in dim_map:
            ph = a * 2 + b
            w2 = w2.at[th, tw, ph * ci:(ph + 1) * ci, :].set(kk[dkh, dkw])
    return w2


def conv_s2d(x, kk):
    b, h, w, ci = x.shape
    u, v = h // 2, w // 2
    xs = x.reshape(b, u, 2, v, 2, ci).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, u, v, 4 * ci)
    w2 = conv_s2d_kernel(kk)
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def measure(fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    dt = median_device_time_s(jfn, *args, calls=8, warmup=2)
    if dt is None:
        import time
        for _ in range(2):
            jfn(*args)
        jax.block_until_ready(jfn(*args))
        t0 = time.perf_counter()
        for _ in range(8):
            out = jfn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 8
    return dt


def main():
    rng = np.random.default_rng(0)
    cases_t = [  # transposed: (B, H, W, Ci, Co)  (input res)
        ("deconv2 16->8 @116x152", 12, 116, 152, 16, 8),
        ("deconv1 256->16 @58x76", 12, 58, 76, 256, 16),
        ("deconv0 128->256 @29x38", 12, 29, 38, 128, 256),
    ]
    for name, b, h, w, ci, co in cases_t:
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
        kk = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
        ref = convt_direct(x, kk)
        new = convt_s2d(x, kk)
        err = float(jnp.max(jnp.abs(ref - new)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        g = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)

        def loss_d(x, kk):
            return jnp.vdot(convt_direct(x, kk), g)

        def loss_s(x, kk):
            return jnp.vdot(convt_s2d(x, kk), g)

        gd = jax.grad(loss_d, (0, 1))(x, kk)
        gs = jax.grad(loss_s, (0, 1))(x, kk)
        gerr = max(float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
                   for a, b in zip(gd, gs))
        td, ts = measure(convt_direct, x, kk), measure(convt_s2d, x, kk)
        tdb = measure(jax.grad(loss_d, (0, 1)), x, kk)
        tsb = measure(jax.grad(loss_s, (0, 1)), x, kk)
        print(f"{name}: err={err:.2e} gerr={gerr:.2e} | "
              f"fwd {td*1e6:.0f} -> {ts*1e6:.0f} us | "
              f"bwd {tdb*1e6:.0f} -> {tsb*1e6:.0f} us", flush=True)

    cases_c = [  # strided conv: (B, H, W, Ci, Co) (input res)
        ("conv0 1->16 @228x304", 12, 228, 304, 1, 16),
        ("conv1 16->256 @114x152", 12, 114, 152, 16, 256),
        ("res3.conv1 64->128 @228x304", 12, 228, 304, 64, 128),
        ("res4.conv1 128->256 @114x152", 12, 114, 152, 128, 256),
    ]
    for name, b, h, w, ci, co in cases_c:
        x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
        kk = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
        ref = conv_direct(x, kk)
        new = conv_s2d(x, kk)
        err = float(jnp.max(jnp.abs(ref - new)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        g = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)

        def loss_d(x, kk):
            return jnp.vdot(conv_direct(x, kk), g)

        def loss_s(x, kk):
            return jnp.vdot(conv_s2d(x, kk), g)

        gd = jax.grad(loss_d, (0, 1))(x, kk)
        gs = jax.grad(loss_s, (0, 1))(x, kk)
        gerr = max(float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
                   for a, b in zip(gd, gs))
        td, ts = measure(conv_direct, x, kk), measure(conv_s2d, x, kk)
        tdb = measure(jax.grad(loss_d, (0, 1)), x, kk)
        tsb = measure(jax.grad(loss_s, (0, 1)), x, kk)
        print(f"{name}: err={err:.2e} gerr={gerr:.2e} | "
              f"fwd {td*1e6:.0f} -> {ts*1e6:.0f} us | "
              f"bwd {tdb*1e6:.0f} -> {tsb*1e6:.0f} us", flush=True)


if __name__ == "__main__":
    main()
