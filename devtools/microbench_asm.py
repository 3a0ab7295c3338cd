"""Microbench: in-Pallas 4x4 phase-assembly strategies for decode_aff.

Input: 16 phases x 8 channels as (B, 128, 64, 128) [zero-padded 58->64,
76->128].  Output: (B, 8, 232, 304) planar.  Variants:
  a) direct strided stores  out[c, a::4, b::4] = phase
  b) pltpu.repeat x4 on sublanes+lanes, mask-select
  c) MXU lane-expansion matmul + strided sublane stores
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


B = 12
NBYTES = B * 8 * 232 * 304 * 4 * 2


def run(name, kernel, extra_inputs=()):
    def f(p, *extra):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, 128, 64, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in extra],
            out_specs=pl.BlockSpec((1, 8, 232, 304), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 8, 232, 304), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(p, *extra)

    php = jnp.zeros((B, 128, 64, 128), jnp.float32)
    try:
        dt = measure(jax.jit(f), php, *extra_inputs)
        print(f"{name:55s} {dt * 1e6:9.0f} us  {NBYTES / dt / 1e9:6.0f} GB/s")
    except Exception as e:
        msg = str(e).split(chr(10))[0][:140]
        print(f"{name:55s} FAILED: {type(e).__name__}: {msg}")


def k_strided(ph_ref, out_ref):
    for c in range(8):
        for a in range(4):
            for b in range(4):
                out_ref[0, c, a::4, b::4] = ph_ref[0, (a * 4 + b) * 8 + c,
                                                   :58, :76]


def k_repeat(ph_ref, out_ref):
    ii = jax.lax.broadcasted_iota(jnp.int32, (232, 304), 0) % 4
    jj = jax.lax.broadcasted_iota(jnp.int32, (232, 304), 1) % 4
    for c in range(8):
        acc = jnp.zeros((232, 304), jnp.float32)
        for a in range(4):
            for b in range(4):
                p = ph_ref[0, (a * 4 + b) * 8 + c, :58, :76]
                r = pltpu.repeat(pltpu.repeat(p, 4, axis=0), 4, axis=1)
                # pltpu.repeat tiles blockwise: [P P P P], not interleaved;
                # for timing purposes layout cost is representative.
                acc = jnp.where((ii == a) & (jj == b), r[:232, :304], acc)
        out_ref[0, c] = acc


def k_matmul(ph_ref, e_ref, out_ref):
    # e_ref: (4, 76, 304) lane-expansion one-hots E_b[j, 4j+b] = 1
    for a in range(4):
        rows = jnp.zeros((8 * 64, 304), jnp.float32)
        for b in range(4):
            p = ph_ref[0, (a * 4 + b) * 8:(a * 4 + b + 1) * 8]  # (8,64,128)
            p2 = p.reshape(8 * 64, 128)[:, :76]
            rows = rows + jnp.dot(p2, e_ref[b],
                                  preferred_element_type=jnp.float32)
        for c in range(8):
            out_ref[0, c, a::4, :] = rows[c * 64:c * 64 + 58, :]


def main():
    run("a) direct strided stores", k_strided)
    run("b) pltpu.repeat + mask", k_repeat)
    e = np.zeros((4, 76, 304), np.float32)
    for b in range(4):
        for j in range(76):
            e[b, j, 4 * j + b] = 1.0
    run("c) lane-expand matmul + strided sublane stores", k_matmul,
        (jnp.asarray(e),))


if __name__ == "__main__":
    main()
