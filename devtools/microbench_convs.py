"""Microbenchmark the hot small-channel convs from the train-step profile.

Measures standalone device time for each offender shape under layout /
precision / reformulation variants, to decide which deserve Pallas kernels.
Dev tool, not part of the library surface.

Usage: python devtools/microbench_convs.py
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.utils.device_time import median_device_time_s


def measure(fn, *args, calls=10, warmup=2):
    if jax.default_backend() == "tpu":
        dt = median_device_time_s(fn, *args, calls=calls, warmup=warmup)
        if dt is not None:
            return dt
    import time
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / calls


def conv(x, k, stride=1, pad=1, dn=("NHWC", "HWIO", "NHWC"), lhs_dilation=None,
         precision=None):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        lhs_dilation=lhs_dilation, dimension_numbers=dn, precision=precision)


def bench(name, fn, *args, flops=None, bytes_=None):
    f = jax.jit(fn)
    dt = measure(f, *args)
    extras = []
    if flops:
        extras.append(f"{flops / dt / 1e12:6.1f} TF/s")
    if bytes_:
        extras.append(f"{bytes_ / dt / 1e9:6.0f} GB/s")
    print(f"{name:55s} {dt * 1e6:9.0f} us  {'  '.join(extras)}")
    return dt


def main():
    rng = np.random.default_rng(0)
    B, H, W = 12, 228, 304

    print("== resnet layer1 conv: 3x3 64->64 @ full res ==")
    x = jnp.asarray(rng.standard_normal((B, H, W, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)
    fl = 2 * B * H * W * 9 * 64 * 64
    by = B * H * W * 64 * 4 * 2
    bench("f32 default", conv, x, k, flops=fl, bytes_=by)
    bench("f32 HIGHEST", functools.partial(conv, precision=jax.lax.Precision.HIGHEST),
          x, k, flops=fl, bytes_=by)
    bench("bf16 in/out", conv, x.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
          flops=fl, bytes_=by // 2)

    print("== heads stage-2 conv: 3x3 256->10 @ full res ==")
    x = jnp.asarray(rng.standard_normal((B, H, W, 256)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 256, 10)) * 0.02, jnp.float32)
    fl = 2 * B * H * W * 9 * 256 * 10
    by = B * H * W * (256 + 10) * 4
    bench("f32 default", conv, x, k, flops=fl, bytes_=by)
    bench("bf16", conv, x.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
          flops=fl, bytes_=by // 2)

    print("== encode_dep conv0: 3x3 s2 1->16, planar in ==")
    xp = jnp.asarray(rng.standard_normal((B, 1, H, W)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 16)) * 0.2, jnp.float32)
    fl = 2 * B * (H // 2) * (W // 2) * 9 * 1 * 16
    by = B * H * W * 4
    bench("NCHW in, NHWC out (current)", functools.partial(
        conv, stride=2, dn=("NCHW", "HWIO", "NHWC")), xp, k, flops=fl, bytes_=by)
    x4 = jnp.asarray(rng.standard_normal((B, H, W, 1)), jnp.float32)
    bench("NHWC in, NHWC out", functools.partial(conv, stride=2), x4, k,
          flops=fl, bytes_=by)

    print("== encode_dep conv1: 3x3 s2 16->256 @ (114,152) ==")
    x = jnp.asarray(rng.standard_normal((B, 114, 152, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 256)) * 0.08, jnp.float32)
    fl = 2 * B * 57 * 76 * 9 * 16 * 256
    by = B * (114 * 152 * 16 + 57 * 76 * 256) * 4
    bench("NHWC (current)", functools.partial(conv, stride=2), x, k,
          flops=fl, bytes_=by)
    xp = jnp.asarray(rng.standard_normal((B, 16, 114, 152)), jnp.float32)
    bench("NCHW in", functools.partial(conv, stride=2, dn=("NCHW", "HWIO", "NHWC")),
          xp, k, flops=fl, bytes_=by)

    print("== decode_aff deconv1: ConvT s2 256->16 (58,76)->(116,152) ==")
    x = jnp.asarray(rng.standard_normal((B, 58, 76, 256)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 256, 16)) * 0.02, jnp.float32)
    fl = 2 * B * 116 * 152 * 9 * 256 * 16 // 4  # ~2.25 taps avg of 9
    by = B * (58 * 76 * 256 + 116 * 152 * 16) * 4
    bench("lhs-dilated NHWC (current)", functools.partial(
        conv, lhs_dilation=(2, 2), pad=1), x, k, flops=fl, bytes_=by)

    print("== decode_aff deconv2: ConvT s2 16->8 (116,152)->(232,304) ==")
    x = jnp.asarray(rng.standard_normal((B, 116, 152, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    fl = 2 * B * 232 * 304 * 9 * 16 * 8 // 4
    by = B * (116 * 152 * 16 + 232 * 304 * 8) * 4

    def deconv2_nchw_out(x, k):
        return conv(x, k, lhs_dilation=(2, 2), pad=1,
                    dn=("NHWC", "HWIO", "NCHW"))

    bench("lhs-dilated NHWC->NCHW (current)", deconv2_nchw_out, x, k,
          flops=fl, bytes_=by)
    bench("lhs-dilated NHWC->NHWC", functools.partial(
        conv, lhs_dilation=(2, 2), pad=1), x, k, flops=fl, bytes_=by)

    def deconv2_phases(x, k):
        # 4-phase decomposition: each output phase is a dense <=2x2 conv.
        # taps: out[2i+py, 2j+px] reads x[i+dy, j+dx] with kernel K[t]
        # K stored pre-flipped as in models/common.ConvTranspose.
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        outs = {}
        outs[(0, 0)] = conv(x, k[1:2, 1:2], pad=0)
        outs[(0, 1)] = conv(xp[:, :-1], k[1:2, 0::2], pad=0)[..., : , :]
        outs[(1, 0)] = conv(xp[:, :, :-1], k[0::2, 1:2], pad=0)
        outs[(1, 1)] = conv(xp, k[0::2, 0::2], pad=0)
        y = jnp.stack([outs[(0, 0)], outs[(0, 1)], outs[(1, 0)], outs[(1, 1)]],
                      axis=3)  # (B, 116, 152, 4, 8)
        y = y.reshape(B, 116, 152, 2, 2, 8)
        y = jnp.moveaxis(y, (3, 4), (2, 4)).reshape(B, 232, 304, 8)
        return y

    bench("4-phase conv + interleave NHWC", deconv2_phases, x, k,
          flops=fl, bytes_=by)


if __name__ == "__main__":
    main()
