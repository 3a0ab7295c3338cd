"""KITTI fork-default b=1 serving latency experiments (VERDICT r3 item 6).

Measures the fork-default (GRU-on) KITTI 240x1216 b=1 forward in f32 and
bf16, plus need_inter on/off, on the real TPU. bench.py carries the f32
row every round; this records the bf16 serving option's value.

    PYTHONPATH=/root/repo:/root/.axon_site python devtools/serve_kitti_b1.py
"""

import sys

sys.path.insert(0, "/root/repo")

from nlspn_eccv20_tpu.config import Config  # noqa: E402
from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import bench_infer  # noqa: E402

base = Config(patch_height=240, patch_width=1216, batch_size=1,
              max_depth=90.0, num_sample=0).finalize()
dt_f32, var = bench_infer(base, 240, 1216)
print(f"KITTI b=1 fork-default f32 (need_inter=True): {dt_f32*1e3:.2f} ms",
      flush=True)
dt_ni, _ = bench_infer(base, 240, 1216, need_inter=False, variables=var)
print(f"KITTI b=1 fork-default f32 (need_inter=False): {dt_ni*1e3:.2f} ms",
      flush=True)
bf = base.replace(precision="bf16").finalize()
dt_bf, _ = bench_infer(bf, 240, 1216, need_inter=False, variables=var)
print(f"KITTI b=1 fork-default bf16 (need_inter=False): {dt_bf*1e3:.2f} ms"
      f" ({dt_ni/dt_bf:.2f}x vs f32)", flush=True)
