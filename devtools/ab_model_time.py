"""Repeatable full-model step timing (device-trace medians).

Times the fp32 + bf16 train step and b=1 inference several times each so
A/B experiments (env-gated or branch-vs-branch) can be compared with
visible run-to-run noise. Dev tool.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python devtools/ab_model_time.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_infer, bench_train_step  # noqa: E402
from nlspn_eccv20_tpu.config import Config  # noqa: E402


def main():
    cfg = Config(patch_height=228, patch_width=304, batch_size=12).finalize()
    reps = int(os.environ.get("AB_REPS", "3"))
    for _ in range(reps):
        _, dt = bench_train_step(cfg, 12, 228, 304)
        print(f"  fp32 train step: {dt*1e3:.1f} ms", flush=True)
    cfgb = cfg.replace(precision="bf16")
    for _ in range(reps):
        _, dt = bench_train_step(cfgb, 12, 228, 304)
        print(f"  bf16 train step: {dt*1e3:.1f} ms", flush=True)
    for _ in range(reps):
        dt, _ = bench_infer(cfg, 228, 304)
        print(f"  infer b=1: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
