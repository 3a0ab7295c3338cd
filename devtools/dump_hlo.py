"""Dump the optimized HLO of the train step and summarize copy/convert ops.

Finds what the profiler's `copy.NNNN` / `convert_element_type` events
actually move (shape, layout, bytes) so layout fixes can be targeted.
Dev tool.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python devtools/dump_hlo.py \
           [--precision bf16] [--out /tmp/step.hlo]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--out", default="/tmp/step.hlo")
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--height", type=int, default=228)
    ap.add_argument("--width", type=int, default=304)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import numpy as np

    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.train import Engine

    b, h, w = args.batch, args.height, args.width
    cfg = Config(patch_height=h, patch_width=w, batch_size=b,
                 precision=args.precision).finalize()
    rng = np.random.default_rng(0)
    gt = np.clip(rng.random((b, h, w, 1)) * 8, 0.1, None).astype(np.float32)
    batch = {
        "rgb": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "dep": (gt * (rng.random((b, h, w, 1)) > 0.97)).astype(np.float32),
        "gt": gt,
    }
    eng = Engine(cfg, steps_per_epoch=100)
    state = eng.init_state((h, w))
    placed = eng.put_train_batch(batch)

    import jax

    lowered = eng.train_step_fn().lower(state, placed)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB HLO to {args.out}")

    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "pred": 1, "u8": 1, "s8": 1,
                "f16": 2, "u32": 4}

    def nbytes(shape_str):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.group(1), m.group(2)
        n = dt_bytes.get(dt, 4)
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n

    pat = re.compile(r"%?([\w.-]+) = (\w+\[[\d,]*\](?:{[^}]*})?) (copy|transpose|convert)\((.*?)\)")
    rows = []
    for m in pat.finditer(txt):
        name, out_shape, kind, operand = m.groups()
        rows.append((nbytes(out_shape), kind, name, out_shape, operand[:90]))
    rows.sort(reverse=True)
    total = defaultdict(int)
    for nb, kind, *_ in rows:
        total[kind] += nb
    print("== total bytes by kind ==")
    for k, v in sorted(total.items(), key=lambda x: -x[1]):
        print(f"  {k}: {v/1e6:.1f} MB")
    print(f"== top {args.top} copy/transpose/convert by bytes ==")
    for nb, kind, name, shape, operand in rows[:args.top]:
        print(f"  {nb/1e6:8.2f} MB  {kind:9s} {name:20s} {shape}  <- {operand}")


if __name__ == "__main__":
    main()
