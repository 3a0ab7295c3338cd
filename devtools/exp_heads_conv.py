"""Heads stage-2 conv formulations A/B (the ~5-10 ms/step headroom noted
in docs/PERFORMANCE.md ceiling analysis: 3x3x256->10 runs at 129 GB/s
because the 10 output channels pad to 128 lanes).

Candidates, all computing conv3x3(x2 [B,H,W,256]) -> 10 planar maps:
  nhwc:       NHWC->NHWC conv + moveaxis to planar (the in-model form)
  nchw_out:   NHWC->NCHW conv (planar direct; channels never on lanes)
  wide_pad:   NHWC->NHWC conv with output channels padded to 128 in the
              WEIGHT (the padding XLA does implicitly, made explicit to
              see whether the emitter handles a 128-wide conv better),
              then slice 10.

Run: PYTHONPATH=/root/repo:/root/.axon_site python devtools/exp_heads_conv.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import measure  # noqa: E402


def main():
    b, h, w, cin, cout = 12, 228, 304, 256, 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                    jnp.float32)
    k128 = jnp.zeros((3, 3, cin, 128), jnp.float32).at[..., :cout].set(k)

    def nhwc(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.moveaxis(y, -1, 1)

    def nchw_out(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NCHW"))

    def wide_pad(x, k128):
        y = jax.lax.conv_general_dilated(
            x, k128, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.moveaxis(y[..., :cout], -1, 1)

    for name, fn, kk in (("nhwc", nhwc, k), ("nchw_out", nchw_out, k),
                         ("wide_pad", wide_pad, k128)):
        try:
            f = jax.jit(fn)
            ref = nhwc(x, k)
            out = f(x, kk)
            err = float(jnp.max(jnp.abs(out - ref)))
            dt = measure(f, x, kk)
            gbs = (x.nbytes + out.nbytes) / dt / 1e9
            print(f"{name:10s}: {dt*1e3:7.3f} ms  {gbs:6.0f} GB/s  "
                  f"maxerr {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    # bf16 variants
    xb = x.astype(jnp.bfloat16)
    for name, fn, kk in (("nhwc/bf16", nhwc, k.astype(jnp.bfloat16)),
                         ("nchw/bf16", nchw_out, k.astype(jnp.bfloat16))):
        f = jax.jit(fn)
        dt = measure(f, xb, kk)
        print(f"{name:10s}: {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
