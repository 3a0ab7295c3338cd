"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: NYU-config training throughput (images/s) on one chip — full
fork-default NLSPN (resnet18, S2D, ConvGRU, 12 prop steps, TGASS,
228x304, batch 12), forward+backward+optimizer under jit.

Timing is DEVICE time extracted from JAX profiler traces
(utils/device_time.py): on this TPU attachment ``block_until_ready``
returns before execution finishes, so wall-clock numbers measure dispatch
overhead, not compute (validated against an 8192^3 matmul reaching ~187
TFLOP/s device-side while "finishing" in 0.05 ms wall). Off-TPU the wall
clock is trusted.

Also measured and printed to stderr as context: single-image inference
latency and propagation-kernel microbenchmarks (XLA vs Pallas per-step vs
Pallas whole-loop).

vs_baseline: ratio against the first recorded run on this hardware
(bench_baseline.json, created on first run) — the reference publishes no
throughput numbers (BASELINE.md), so the baseline tracks regressions across
rounds rather than a foreign implementation.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _eprint(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(fn, *args, calls: int = 8, warmup: int = 2) -> float:
    """Seconds per call: device time on TPU, wall clock elsewhere."""
    import jax

    if jax.default_backend() == "tpu":
        from nlspn_eccv20_tpu.utils.device_time import median_device_time_s

        dt = median_device_time_s(fn, *args, calls=calls, warmup=warmup)
        if dt is not None:
            return dt
        _eprint("  (no device events in trace; falling back to wall clock)")
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / calls


def bench_train_step(cfg, b, h, w):
    import numpy as np

    from nlspn_eccv20_tpu.train import Engine

    rng = np.random.default_rng(0)
    gt = np.clip(rng.random((b, h, w, 1)) * 8, 0.1, None).astype(np.float32)
    batch = {
        "rgb": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "dep": (gt * (rng.random((b, h, w, 1)) > 0.97)).astype(np.float32),
        "gt": gt,
    }
    eng = Engine(cfg, steps_per_epoch=100)
    state = eng.init_state((h, w))
    step = eng.train_step_fn()
    placed = eng.put_train_batch(batch)

    holder = {"state": state}

    def run():
        holder["state"], aux = step(holder["state"], placed)
        return aux["loss"]

    dt = measure(run, calls=8, warmup=3)
    return b / dt, dt


def bench_infer(cfg, h, w, need_inter=True, variables=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nlspn_eccv20_tpu.models import get_model

    model = get_model(cfg)
    rng = np.random.default_rng(0)
    sample = {
        "rgb": jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32),
        "dep": jnp.asarray((rng.random((1, h, w, 1)) > 0.97) * 5, jnp.float32),
    }
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    fwd = jax.jit(lambda v, s: model.apply(v, s, train=False,
                                           need_inter=need_inter)["pred"])
    return measure(fwd, variables, sample, calls=8, warmup=2), variables


def bench_prop_kernels(b, h, w, steps=12):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nlspn_eccv20_tpu.ops.pallas.local_prop import (
        fused_prop_step,
        propagate_loop_pallas,
    )
    from nlspn_eccv20_tpu.ops.propagate import propagate_local

    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
    conf = jnp.asarray(rng.random((b, h, w, 1)), jnp.float32)
    dep = jnp.asarray((rng.random((b, h, w, 1)) > 0.9) * 1.0, jnp.float32)
    aff = jnp.asarray(rng.standard_normal((b, h, w, 9)) * 0.11, jnp.float32)

    def xla_loop(pred, aff, conf, dep):
        m = (dep > 0).astype(pred.dtype)
        cur = (1 - m) * pred + m * dep
        for _ in range(steps):
            o = propagate_local(cur * conf, aff)
            cur = (1 - m) * o + m * dep
        return cur

    def pallas_step_loop(pred, aff, conf, dep):
        m = (dep > 0).astype(pred.dtype)
        cur = (1 - m) * pred + m * dep
        for _ in range(steps):
            cur = fused_prop_step(cur, aff, conf=conf, dep=dep, preserve=True)
        return cur

    results = {}
    results["xla"] = measure(jax.jit(xla_loop), pred, aff, conf, dep)
    results["pallas_step"] = measure(jax.jit(pallas_step_loop), pred, aff,
                                     conf, dep)
    try:
        f = jax.jit(lambda p, a, c, d: propagate_loop_pallas(
            p, a, conf=c, dep=d, steps=steps, preserve=True, pre_blend=True))
        results["pallas_loop"] = measure(f, pred, aff, conf, dep)
    except Exception as e:
        results["pallas_loop"] = None
        _eprint(f"  pallas_loop unavailable at {h}x{w}: {type(e).__name__}")
    return results


def bench_deform_kernels(b, h, w):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nlspn_eccv20_tpu.ops.propagate import (
        propagate_deformable_exact,
        propagate_deformable_windowed,
    )

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((b, h, w, 1)), jnp.float32)
    off = jnp.asarray(
        np.clip(rng.standard_normal((b, h, w, 18)) * 1.5, -4, 4), jnp.float32)
    aff = jnp.asarray(rng.standard_normal((b, h, w, 9)) * 0.11, jnp.float32)

    results = {}
    results["windowed"] = measure(
        jax.jit(lambda f, o, a: propagate_deformable_windowed(
            f, o, a, radius=4)), feat, off, aff)
    try:
        from nlspn_eccv20_tpu.ops.pallas.deform_prop import (
            propagate_deformable_pallas,
        )

        results["pallas"] = measure(
            jax.jit(lambda f, o, a: propagate_deformable_pallas(
                f, o, a, radius=4)), feat, off, aff)
    except Exception as e:
        results["pallas"] = None
        _eprint(f"  deform pallas unavailable: {type(e).__name__}")
    if not os.environ.get("BENCH_SKIP_EXACT_GATHER"):
        # the old exact-gather path is ~300 ms/call; keep calls low
        results["exact_gather"] = measure(
            jax.jit(lambda f, o, a: propagate_deformable_exact(f, o, a)),
            feat, off, aff, calls=2, warmup=1)
    return results


def main():
    import jax

    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    _eprint(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    cfg = Config(patch_height=228, patch_width=304, batch_size=12,
                 prop_impl="auto").finalize()

    imgs_per_s, step_dt = bench_train_step(cfg, 12, 228, 304)
    _eprint(f"NYU train step (b=12): {step_dt*1e3:.1f} ms -> {imgs_per_s:.1f} images/s")

    # Print the headline JSON line FIRST: the context measurements below are
    # best-effort and must not cost the round its benchmark record if the
    # driver's time budget runs out mid-microbench.
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["value"]
    else:
        base = imgs_per_s
        with open(baseline_path, "w") as f:
            json.dump({"metric": "nyu_train_images_per_s_per_chip",
                       "value": imgs_per_s}, f)

    print(json.dumps({
        "metric": "nyu_train_images_per_s_per_chip",
        "value": round(imgs_per_s, 2),
        "unit": "images/s",
        "vs_baseline": round(imgs_per_s / base, 3),
    }), flush=True)

    if os.environ.get("BENCH_HEADLINE_ONLY"):
        return

    try:
        cfg_bf16 = cfg.replace(precision="bf16")
        imgs_bf16, dt_bf16 = bench_train_step(cfg_bf16, 12, 228, 304)
        _eprint(f"NYU train step (b=12, bf16): {dt_bf16*1e3:.1f} ms -> {imgs_bf16:.1f} images/s")

        infer_dt, _ = bench_infer(cfg, 228, 304)
        _eprint(f"NYU inference (b=1): {infer_dt*1e3:.2f} ms/image")

        # Constant-affinity (use_GRU=False, upstream-NLSPN default) serving:
        # 'auto' routes the whole propagation loop through the fused Pallas
        # VMEM-resident kernel; 'xla' is the per-step fused baseline.
        cfg_ng = cfg.replace(use_GRU=False, prop_impl="xla").finalize()
        dt_ng_xla, var_ng = bench_infer(cfg_ng, 228, 304, need_inter=False)
        cfg_ng_p = cfg_ng.replace(prop_impl="auto").finalize()
        dt_ng_pl, _ = bench_infer(cfg_ng_p, 228, 304, need_inter=False,
                                  variables=var_ng)
        _eprint(f"NYU inference b=1 use_GRU=False: xla {dt_ng_xla*1e3:.2f} ms"
                f" | pallas-loop {dt_ng_pl*1e3:.2f} ms"
                f" ({dt_ng_xla/dt_ng_pl:.2f}x)")

        # KITTI DC headline config (240x1216 after top_crop; BASELINE.md):
        # batch sized to chip HBM; reference trains this on 8x P40.
        for bk in (3, 4, 6):
            try:
                cfg_k = Config(patch_height=240, patch_width=1216,
                               batch_size=bk, max_depth=90.0,
                               num_sample=0).finalize()
                imgs_k, dt_k = bench_train_step(cfg_k, bk, 240, 1216)
                _eprint(f"KITTI train step (b={bk}): {dt_k*1e3:.1f} ms -> "
                        f"{imgs_k:.1f} images/s")
                if bk == 3:
                    imgs_kb, dt_kb = bench_train_step(
                        cfg_k.replace(precision="bf16"), bk, 240, 1216)
                    _eprint(f"KITTI train step (b={bk}, bf16): "
                            f"{dt_kb*1e3:.1f} ms -> {imgs_kb:.1f} images/s")
            except Exception as e:  # e.g. HBM OOM at the largest batch
                _eprint(f"KITTI train step (b={bk}) failed: "
                        f"{type(e).__name__}")
        cfg_k = Config(patch_height=240, patch_width=1216, batch_size=3,
                       max_depth=90.0, num_sample=0).finalize()
        infer_k, _ = bench_infer(cfg_k, 240, 1216)
        _eprint(f"KITTI inference (b=1): {infer_k*1e3:.2f} ms/image")
        cfg_kng = cfg_k.replace(use_GRU=False, prop_impl="xla").finalize()
        dt_k_xla, var_kng = bench_infer(cfg_kng, 240, 1216, need_inter=False)
        dt_k_pl, _ = bench_infer(cfg_kng.replace(prop_impl="auto").finalize(),
                                 240, 1216, need_inter=False,
                                 variables=var_kng)
        _eprint(f"KITTI inference b=1 use_GRU=False: xla {dt_k_xla*1e3:.2f} ms"
                f" | pallas-loop {dt_k_pl*1e3:.2f} ms"
                f" ({dt_k_xla/dt_k_pl:.2f}x)")

        for (b, h, w) in [(12, 228, 304), (4, 240, 1216)]:
            r = bench_prop_kernels(b, h, w)
            k = 12 * b
            msg = " | ".join(
                f"{name}: {dt*1e6:.0f}us ({k/dt/1e3:.1f}k iters/s)" if dt else f"{name}: n/a"
                for name, dt in r.items())
            _eprint(f"prop loop {b}x{h}x{w}: {msg}")

        # Non-local (--offset) path: windowed reformulation vs the exact
        # gather (the old all-backends default), single prop step fwd.
        r = bench_deform_kernels(12, 228, 304)
        msg = " | ".join(f"{n}: {dt*1e6:.0f}us" if dt else f"{n}: n/a"
                         for n, dt in r.items())
        _eprint(f"deform prop step 12x228x304: {msg}")

        cfg_off = cfg.replace(offset=True).finalize()
        imgs_off, dt_off = bench_train_step(cfg_off, 12, 228, 304)
        _eprint(f"NYU offset train step (b=12): {dt_off*1e3:.1f} ms -> "
                f"{imgs_off:.1f} images/s")
        imgs_offb, dt_offb = bench_train_step(
            cfg_off.replace(precision="bf16"), 12, 228, 304)
        _eprint(f"NYU offset train step (b=12, bf16): {dt_offb*1e3:.1f} ms"
                f" -> {imgs_offb:.1f} images/s")
    except Exception as e:  # context only — never fail the benchmark
        _eprint(f"context benches aborted: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
