"""Calibrate the standalone whole-loop Pallas kernel vs the XLA per-step
loop across shapes (r03; backs the table in docs/PERFORMANCE.md and
ops/pallas/local_prop.loop_kernel_profitable). Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python devtools/route_cal.py
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache
from bench import measure, bench_prop_kernels

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

SHAPES = [(1, 228, 304), (2, 228, 304), (4, 228, 304), (12, 228, 304),
          (1, 240, 1216), (2, 240, 1216), (4, 240, 1216),
          (1, 480, 640), (1, 120, 160)]
for (b, h, w) in SHAPES:
    try:
        r = bench_prop_kernels(b, h, w)
        x, pl = r["xla"], r.get("pallas_loop")
        ratio = (x / pl) if pl else float("nan")
        print(f"{b}x{h}x{w}: xla {x*1e6:.0f}us | loop "
              f"{(pl or 0)*1e6:.0f}us | speedup {ratio:.2f}x", flush=True)
    except Exception as e:
        print(f"{b}x{h}x{w}: FAIL {type(e).__name__}: {e}", flush=True)
