"""r04 layout experiment (VERDICT r3 item 9): does a transpose-pair
firewall around the whole-loop Pallas kernel stop the custom call's
row-major operand-layout pin from degrading the upstream convs?

Measures b=1 GRU-off inference, NYU + KITTI shapes: xla routing vs forced
pallas vs forced pallas + NLSPN_LOOP_LAYOUT_FIREWALL=1. Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python devtools/exp_loop_layout.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from nlspn_eccv20_tpu.config import Config  # noqa: E402
from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import bench_infer  # noqa: E402

for (h, w, tag, kw) in [(228, 304, "NYU", {}),
                        (240, 1216, "KITTI", dict(max_depth=90.0,
                                                  num_sample=0))]:
    cfg = Config(patch_height=h, patch_width=w, batch_size=1,
                 use_GRU=False, prop_impl="xla", **kw).finalize()
    dt_x, var = bench_infer(cfg, h, w, need_inter=False)
    os.environ.pop("NLSPN_LOOP_LAYOUT_FIREWALL", None)
    dt_p, _ = bench_infer(cfg.replace(prop_impl="pallas").finalize(), h, w,
                          need_inter=False, variables=var)
    os.environ["NLSPN_LOOP_LAYOUT_FIREWALL"] = "1"
    dt_f, _ = bench_infer(cfg.replace(prop_impl="pallas").finalize(), h, w,
                          need_inter=False, variables=var)
    os.environ.pop("NLSPN_LOOP_LAYOUT_FIREWALL", None)
    print(f"{tag} b=1 GRU-off: xla {dt_x*1e3:.2f} ms | pallas "
          f"{dt_p*1e3:.2f} ms ({dt_x/dt_p:.2f}x) | pallas+firewall "
          f"{dt_f*1e3:.2f} ms ({dt_x/dt_f:.2f}x)", flush=True)
