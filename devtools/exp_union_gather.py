"""Standalone microbench: union-of-shifts vs unrolled windowed gather
(r04, see propagate_deformable_windowed_union docstring). Forward and
fwd+bwd per step at the NYU b=12 bench shape.

    PYTHONPATH=/root/repo:/root/.axon_site python devtools/exp_union_gather.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nlspn_eccv20_tpu.ops.propagate import (  # noqa: E402
    propagate_deformable_windowed,
    propagate_deformable_windowed_union,
)
from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import measure  # noqa: E402

b, h, w = 12, 228, 304
rng = np.random.default_rng(0)
feat = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
off = jnp.asarray(np.clip(rng.standard_normal((b, h, w, 18)) * 1.5, -4, 4),
                  jnp.float32)
aff = jnp.asarray(rng.standard_normal((b, h, w, 9)) * 0.11, jnp.float32)

for name, fn in (("unroll", propagate_deformable_windowed),
                 ("union", propagate_deformable_windowed_union)):
    fwd = jax.jit(lambda f, o, a, fn=fn: fn(f, o, a, radius=4))
    dt_f = measure(fwd, feat, off, aff)

    def loss(f, o, a, fn=fn):
        return jnp.sum(fn(f, o, a, radius=4) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    dt_g = measure(g, feat, off, aff)
    print(f"{name}: fwd {dt_f*1e6:.0f} us | fwd+bwd {dt_g*1e6:.0f} us",
          flush=True)
