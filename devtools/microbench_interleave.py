"""Microbench: phase interleave / de-interleave options for the fused
decode_aff Pallas kernel boundary.

The kernel computes 16 output phases (4x4 pixel decimation) of the 8-channel
raw affinity; something must interleave them to (B, 8, 232, 304) planar.
Candidates: XLA transpose+reshape (planar, channel-leading), vs in-Pallas
mask+repeat assembly. Also: deconv0 planar_out cost (kernel input layout).
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


def bench(name, fn, *args, bytes_=None):
    dt = measure(jax.jit(fn), *args)
    bw = f"{bytes_ / dt / 1e9:6.0f} GB/s" if bytes_ else ""
    print(f"{name:55s} {dt * 1e6:9.0f} us  {bw}")


def main():
    rng = np.random.default_rng(0)
    B = 12

    # ---- XLA planar interleave: (B, 8, 4, 4, 58, 76) -> (B, 8, 232, 304)
    ph = jnp.asarray(rng.standard_normal((B, 8, 4, 4, 58, 76)), jnp.float32)
    nbytes = ph.size * 4 * 2

    def interleave(p):
        # (B, C, a, b, i, j) -> (B, C, i, a, j, b) -> (B, C, 232, 304)
        return jnp.transpose(p, (0, 1, 4, 2, 5, 3)).reshape(B, 8, 232, 304)

    bench("XLA planar interleave 4x4 (27MB)", interleave, ph, bytes_=nbytes)

    # flat-lane variant: phases stored (B, 128, 4408) [16ph*8c, i*76+j]
    phf = jnp.asarray(rng.standard_normal((B, 128, 4408)), jnp.float32)

    def interleave_flat(p):
        # rows: ph-major (a*4+b)*8+c ; reshape lanes 4408 -> (58, 76)
        p = p.reshape(B, 4, 4, 8, 58, 76)
        return jnp.transpose(p, (0, 3, 4, 1, 5, 2)).reshape(B, 8, 232, 304)

    bench("XLA flat->planar interleave (27MB)", interleave_flat, phf,
          bytes_=nbytes)

    # ---- XLA planar de-interleave (backward direction)
    g = jnp.asarray(rng.standard_normal((B, 8, 232, 304)), jnp.float32)

    def deinterleave(x):
        x = x.reshape(B, 8, 58, 4, 76, 4)
        return jnp.transpose(x, (0, 3, 5, 1, 2, 4)).reshape(B, 128, 58, 76)

    bench("XLA planar de-interleave (27MB)", deinterleave, g, bytes_=nbytes)

    # ---- in-Pallas mask+repeat assembly
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def asm_kernel(ph_ref, out_ref):
        # ph_ref: (1, 128, 64, 128) zero-padded (58->64, 76->128)
        # out_ref: (1, 8, 232, 304)
        ii = jax.lax.broadcasted_iota(jnp.int32, (232, 304), 0) % 4
        jj = jax.lax.broadcasted_iota(jnp.int32, (232, 304), 1) % 4
        for c in range(8):
            acc = jnp.zeros((232, 304), jnp.float32)
            for a in range(4):
                for b in range(4):
                    p = ph_ref[0, (a * 4 + b) * 8 + c]          # (64, 128)
                    r = jnp.repeat(jnp.repeat(p[:58, :76], 4, axis=0),
                                   4, axis=1)                    # (232, 304)
                    acc = jnp.where((ii == a) & (jj == b), r, acc)
            out_ref[0, c] = acc

    php = jnp.zeros((B, 128, 64, 128), jnp.float32)

    def pallas_asm(p):
        return pl.pallas_call(
            asm_kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, 128, 64, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 8, 232, 304), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, 232, 304), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(p)

    try:
        bench("Pallas mask+repeat assembly (27MB)", pallas_asm, php,
              bytes_=nbytes)
    except Exception as e:
        print(f"pallas asm failed: {type(e).__name__}: {e}")

    # ---- deconv0 output layout: NHWC vs planar NCHW out
    x = jnp.asarray(rng.standard_normal((B, 29, 38, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 128, 256)) * 0.03, jnp.float32)

    def deconv0(x, k, dn):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", dn))

    bench("deconv0 128->256 NHWC out", functools.partial(deconv0, dn="NHWC"),
          x, k)
    bench("deconv0 128->256 NCHW out", functools.partial(deconv0, dn="NCHW"),
          x, k)

    # NHWC (B,58,76,256) -> flat planar (B,256,4408)
    y = jnp.asarray(rng.standard_normal((B, 58, 76, 256)), jnp.float32)

    def to_flat(y):
        return jnp.transpose(y, (0, 3, 1, 2)).reshape(B, 256, 4408)

    bench("XLA NHWC->flat-planar transpose (54MB)", to_flat, y,
          bytes_=y.size * 8)


if __name__ == "__main__":
    main()
