"""Offset (--offset) train-step profiling matrix (VERDICT r3 item 5).

Times the full NYU b=12 train step for one combination of
(offset_window, offset_neighbor_loop, precision) given on the CLI, using
bench.py's device-time measurement. Run one at a time (TPU is exclusive):

    PYTHONPATH=/root/repo:/root/.axon_site python devtools/offset_prof.py \
        <window> <unroll|scan> [f32|bf16] [batch]
"""

import sys

sys.path.insert(0, "/root/repo")

window = int(sys.argv[1]) if len(sys.argv) > 1 else 4
loop = sys.argv[2] if len(sys.argv) > 2 else "unroll"
prec = sys.argv[3] if len(sys.argv) > 3 else "f32"
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 12

from nlspn_eccv20_tpu.config import Config  # noqa: E402
from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import bench_train_step  # noqa: E402

cfg = Config(patch_height=228, patch_width=304, batch_size=batch,
             offset=True, offset_window=window,
             offset_neighbor_loop=loop, precision=prec).finalize()
import time  # noqa: E402

t0 = time.monotonic()
imgs, dt = bench_train_step(cfg, batch, 228, 304)
print(f"offset train b={batch} window={window} loop={loop} {prec}: "
      f"{dt*1e3:.1f} ms/step -> {imgs:.1f} images/s "
      f"(total incl compile {time.monotonic()-t0:.0f}s)", flush=True)
