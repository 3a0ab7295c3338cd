"""Per-op device-time breakdown of the headline train step on TPU.

Runs the fork-default NYU train step under a profiler trace and prints the
XLA-Ops-lane events grouped by op category and by individual op name, so
kernel work can be targeted at the real offenders. Dev tool, not part of
the library surface.

Usage: python tools/profile_step.py [--precision bf16] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import tempfile
from collections import defaultdict


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--height", type=int, default=228)
    ap.add_argument("--width", type=int, default=304)
    ap.add_argument("--eval", action="store_true", help="profile the eval step")
    args = ap.parse_args()

    import jax
    import numpy as np

    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.train import Engine

    h, w, b = args.height, args.width, args.batch
    cfg = Config(data_name="Synthetic", patch_height=h, patch_width=w,
                 batch_size=b, precision=args.precision).finalize()
    eng = Engine(cfg, steps_per_epoch=100)
    state = eng.init_state((h, w))

    rng = np.random.default_rng(0)
    gt = np.clip(rng.random((b, h, w, 1)) * 8, 0.1, None).astype(np.float32)
    batch = {
        "rgb": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "dep": (gt * (rng.random((b, h, w, 1)) > 0.9)).astype(np.float32),
        "gt": gt,
    }
    placed = eng.put_train_batch(batch)

    holder = {"state": state}
    if args.eval:
        step_fn = eng.eval_step_fn()

        def run():
            return step_fn(holder["state"], placed)
    else:
        train_step = eng.train_step_fn()

        def run():
            # chain the (donated) state exactly as bench.py does
            holder["state"], aux = train_step(holder["state"], placed)
            return aux["loss"]

    for _ in range(3):
        out = run()
    jax.block_until_ready(out)

    calls = 6
    with tempfile.TemporaryDirectory(prefix="profstep_") as td:
        jax.profiler.start_trace(td)
        for _ in range(calls):
            out = run()
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        paths = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                          recursive=True)
        events = []
        pid_names = {}
        for p in paths:
            with gzip.open(p) as f:
                data = json.load(f)
            for e in data.get("traceEvents", []):
                if e.get("ph") == "M" and e.get("name") == "process_name":
                    pid_names[e["pid"]] = e["args"].get("name", "")
                if e.get("ph") == "X" and "dur" in e:
                    events.append(e)

    ops_pids = {pid for pid, name in pid_names.items() if "XLA Ops" in name}
    op_events = [e for e in events if e["pid"] in ops_pids]
    if not op_events:
        # fall back: anything that looks like a fusion/conv op name
        op_events = [e for e in events
                     if re.match(r"^(fusion|convolution|copy|%)", e.get("name", ""))]
    print(f"# {len(op_events)} XLA-op events over {calls} calls")

    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    for e in op_events:
        name = e["name"]
        dur = float(e["dur"]) / calls  # us per step
        by_name[name] += dur
        base = re.sub(r"[.\d]+$", "", name.split("(")[0])
        by_cat[base] += dur

    total = sum(by_cat.values())
    print(f"\n== categories (us/step, total {total:.0f}) ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{v:10.1f}  {k}")

    # Join with HLO metadata: map each executed op to its JAX-level op_name
    # (source path inside the model), then aggregate per site. Loop-unrolled
    # iterations share a site once the trailing _N disambiguators are folded.
    hlo = (train_step if not args.eval else step_fn).lower(
        state, placed).compile().as_text()
    name_to_site = {}
    pat = re.compile(r"^\s*%?([\w.-]+) = .*?op_name=\"([^\"]*)\"", re.M)
    for m in pat.finditer(hlo):
        name_to_site[m.group(1)] = m.group(2)

    by_site = defaultdict(float)
    site_counts = defaultdict(int)
    unattributed = 0.0
    for name, dur in by_name.items():
        site = name_to_site.get(name.split("(")[0])
        if site is None:
            unattributed += dur
            continue
        # fold unroll disambiguators: foo_11/bar -> foo/bar
        site = re.sub(r"_\d+(/|$)", r"\1", site)
        site = site.replace("jit(step)/", "").replace(
            "jvp(NLSPNModel)/", "").replace("transpose(", "bwd(")
        by_site[site] += dur
        site_counts[site] += 1
    print(f"\n== top {args.top} sites (us/step, #ops) — "
          f"{unattributed:.0f}us unattributed ==")
    for k, v in sorted(by_site.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{v:10.1f}  x{site_counts[k]:<4d} {k}")

    print(f"\n== top {args.top} individual ops (us/step) ==")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{v:10.1f}  {k}")


if __name__ == "__main__":
    main()
