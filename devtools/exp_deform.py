"""Microbenchmark the deformable (offset) propagation path on TPU.

Sets the bar for a Pallas deformable-gather kernel (VERDICT item #2):
measures the pure-JAX take_along_axis formulation (ops/propagate.py)
forward and forward+backward at NYU/KITTI shapes, plus candidate
XLA reformulations.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.ops.propagate import propagate_deformable
from bench import measure


def make_inputs(b, h, w, k2=9, off_scale=2.0, seed=0):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 2 * k2)) * off_scale,
                      jnp.float32)
    aff = jnp.asarray(rng.standard_normal((b, h, w, k2)) * 0.11, jnp.float32)
    return feat, off, aff


def main():
    print("backend:", jax.default_backend())
    for (b, h, w) in [(12, 228, 304), (1, 240, 1216), (3, 240, 1216)]:
        feat, off, aff = make_inputs(b, h, w)

        fwd = jax.jit(functools.partial(propagate_deformable, kernel=3))
        t_fwd = measure(fwd, feat, off, aff)

        def loss(f, o, a):
            out = propagate_deformable(f, o, a, kernel=3)
            return jnp.sum(out * out)

        gradf = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        t_bwd = measure(gradf, feat, off, aff)

        # 12-step loop with fixed offsets (inference use_GRU=False shape)
        def loop(f, o, a):
            cur = f
            for _ in range(12):
                cur = propagate_deformable(cur, o, a, kernel=3)
            return cur
        t_loop = measure(jax.jit(loop), feat, off, aff)

        print(f"{b}x{h}x{w}: fwd {t_fwd*1e6:.0f}us  fwd+bwd {t_bwd*1e6:.0f}us"
              f"  12-step {t_loop*1e6:.0f}us")


if __name__ == "__main__":
    main()
