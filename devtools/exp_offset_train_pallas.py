"""Model-level A/B: the full --offset NYU b=12 TRAIN step with the
windowed gather routed through XLA vs the Pallas shift-accumulate kernels
(ops/pallas/deform_prop.py). The decisive measurement for the r05 routing
decision (VERDICT r4 item 1).

    PYTHONPATH=/root/repo:/root/.axon_site python devtools/exp_offset_train_pallas.py [radius]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from nlspn_eccv20_tpu.config import Config  # noqa: E402
from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import bench_train_step  # noqa: E402

radius = int(sys.argv[1]) if len(sys.argv) > 1 else 4

base = Config(patch_height=228, patch_width=304, batch_size=12,
              offset=True, offset_window=radius).finalize()

for impl in ("xla", "pallas"):
    cfg = base.replace(prop_impl=impl).finalize()
    t0 = time.perf_counter()
    imgs, dt = bench_train_step(cfg, 12, 228, 304)
    print(f"offset R={radius} impl={impl}: {dt*1e3:.1f} ms/step -> "
          f"{imgs:.1f} img/s (incl. compile+measure {time.perf_counter()-t0:.0f}s)",
          flush=True)
