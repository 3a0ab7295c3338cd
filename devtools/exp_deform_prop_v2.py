"""A/B: Pallas shift-accumulate deformable kernel (grid-over-neighbors, r05)
vs the XLA windowed form — standalone op timings on the real TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python devtools/exp_deform_prop_v2.py [b h w radius]
Writes progress to stdout; run under `timeout` — a Mosaic compile hang IS
the negative result (round 2/3's single-body kernel hung >9 min).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import measure as dev_time  # noqa: E402  (device-honest timing:
# on this attachment block_until_ready returns before device execution
# completes, so wall clock measures dispatch only — utils/device_time.py)


def main():
    from nlspn_eccv20_tpu.ops.pallas.deform_prop import _deform_op
    from nlspn_eccv20_tpu.ops.propagate import (
        propagate_deformable_windowed,
    )
    from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    b, h, w, radius = 12, 228, 304, 4
    if len(sys.argv) > 1:
        b, h, w, radius = map(int, sys.argv[1:5])
    kernel = 3
    k2 = kernel * kernel
    print(f"backend={jax.default_backend()} shape={b}x{h}x{w} R={radius}",
          flush=True)

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 2 * k2)) * 1.5,
                      jnp.float32)
    aff = jnp.asarray(rng.standard_normal((b, h, w, k2)), jnp.float32)
    fp, op_, ap = (feat[..., 0], jnp.moveaxis(off, -1, 1),
                   jnp.moveaxis(aff, -1, 1))

    # --- XLA windowed (production today) ---
    xla_fwd = jax.jit(lambda f, o, a: propagate_deformable_windowed(
        f, o, a, kernel=kernel, radius=radius))
    t = dev_time(xla_fwd, feat, off, aff)
    print(f"xla windowed fwd:        {t*1e6:9.0f} us", flush=True)

    def xla_loss(f, o, a):
        return jnp.sum(propagate_deformable_windowed(
            f, o, a, kernel=kernel, radius=radius) ** 2)

    xla_grad = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2)))
    t = dev_time(xla_grad, feat, off, aff)
    print(f"xla windowed fwd+bwd:    {t*1e6:9.0f} us", flush=True)

    # --- Pallas (this experiment) ---
    print("compiling pallas fwd ...", flush=True)
    t0 = time.perf_counter()
    pal_fwd = jax.jit(lambda f, o, a: _deform_op(f, o, a, kernel, radius))
    out = pal_fwd(fp, op_, ap)
    jax.block_until_ready(out)
    print(f"pallas fwd compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    want = xla_fwd(feat, off, aff)
    err = float(jnp.max(jnp.abs(out - want[..., 0])))
    scale = float(jnp.max(jnp.abs(want)))
    print(f"pallas fwd max err {err:.3e} (scale {scale:.3e})", flush=True)
    t = dev_time(pal_fwd, fp, op_, ap)
    print(f"pallas fwd:              {t*1e6:9.0f} us", flush=True)

    print("compiling pallas fwd+bwd ...", flush=True)
    t0 = time.perf_counter()

    def pal_loss(f, o, a):
        return jnp.sum(_deform_op(f, o, a, kernel, radius) ** 2)

    pal_grad = jax.jit(jax.grad(pal_loss, argnums=(0, 1, 2)))
    gp = pal_grad(fp, op_, ap)
    jax.block_until_ready(gp)
    print(f"pallas fwd+bwd compiled in {time.perf_counter()-t0:.1f}s",
          flush=True)
    gr = xla_grad(feat, off, aff)
    # compare grads in NHWC against the XLA vjp (convert ours planar->NHWC)
    g_off_p = jnp.moveaxis(gp[1], 1, -1)
    g_aff_p = jnp.moveaxis(gp[2], 1, -1)
    for name, a_, b_ in (("dfeat", gp[0], gr[0][..., 0]),
                         ("doff", g_off_p, gr[1]),
                         ("daff", g_aff_p, gr[2])):
        e = float(jnp.max(jnp.abs(a_ - b_)))
        s = float(jnp.max(jnp.abs(b_))) or 1.0
        print(f"  grad {name}: max err {e:.3e} (scale {s:.3e})", flush=True)
    t = dev_time(pal_grad, fp, op_, ap)
    print(f"pallas fwd+bwd:          {t*1e6:9.0f} us", flush=True)


if __name__ == "__main__":
    main()
