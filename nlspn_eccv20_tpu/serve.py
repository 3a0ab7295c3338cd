"""Inference / serving surface.

The reference has no serving path beyond ``test()``'s per-image loop
(/root/reference/src/main.py:388-414). For production serving on TPU this
module provides a ``Predictor`` that:

  * loads weights from an experiment dir (Orbax), a reference torch
    checkpoint (.pt/.pth), or an in-memory variable tree;
  * pads arbitrary input sizes up to static shape buckets (multiples of
    ``bucket``) so XLA compiles once per bucket, not once per image size —
    KITTI raw frames vary a few pixels between drives;
  * runs the jitted forward in fp32 or bf16 compute and returns the dense
    depth cropped back to the request size;
  * reports device-honest latency via ``benchmark()``.

Usage:
    p = Predictor(cfg, checkpoint="/path/to/experiment_dir")
    depth = p.predict(rgb, sparse_depth)     # (H, W, 3) float, (H, W) float
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from nlspn_eccv20_tpu.models import get_model


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Predictor:
    """Static-shape-bucketed jitted NLSPN inference."""

    def __init__(self, cfg: Config, variables=None,
                 checkpoint: Optional[str] = None, bucket: int = 32):
        if cfg.compile_cache:
            from nlspn_eccv20_tpu.utils.compile_cache import (
                enable_compilation_cache,
            )

            enable_compilation_cache(cfg.compile_cache_dir)
        self.cfg = cfg
        self.bucket = bucket
        self.model = get_model(cfg)
        if variables is None:
            if checkpoint is None:
                raise ValueError("need `variables` or `checkpoint`")
            variables = self._load(checkpoint)
        self.variables = variables
        self._fns: Dict[Tuple[int, int, int], callable] = {}

    # ---- weights -----------------------------------------------------
    def _load(self, src: str):
        import os

        h = _round_up(self.cfg.patch_height, self.bucket)
        w = _round_up(self.cfg.patch_width, self.bucket)
        sample = {"rgb": jnp.zeros((1, h, w, 3), jnp.float32),
                  "dep": jnp.zeros((1, h, w, 1), jnp.float32)}
        # jit: one compiled (and persistently cacheable) program instead of
        # hundreds of eager op-by-op compiles (see utils/compile_cache.py).
        import functools

        variables = jax.jit(functools.partial(self.model.init, train=False))(
            jax.random.PRNGKey(0), sample)
        if os.path.isfile(src) and src.endswith((".pt", ".pth", ".tar")):
            from nlspn_eccv20_tpu.utils.torch_import import (
                load_nlspn_torch_checkpoint,
            )

            return load_nlspn_torch_checkpoint(variables, src, self.cfg)
        from nlspn_eccv20_tpu.utils.checkpoint import CheckpointManager

        restored = CheckpointManager(self.cfg, src).restore()
        out = {"params": restored["params"]}
        if restored.get("batch_stats") is not None:
            out["batch_stats"] = restored["batch_stats"]
        return out

    # ---- shape bucketing ---------------------------------------------
    def _fn_for(self, b: int, h: int, w: int):
        key = (b, h, w)
        if key not in self._fns:
            model = self.model

            def fwd(variables, sample):
                # need_inter=False: serving only consumes the final pred,
                # which skips per-iteration collection. The propagation
                # loop runs XLA's fused per-step form under 'auto' — the
                # whole-loop Pallas kernel, despite winning 4.4-4.6x
                # standalone at b=1, loses in-model to custom-call layout
                # propagation (docs/PERFORMANCE.md; r03 measurement).
                return model.apply(variables, sample, train=False,
                                   need_inter=False)["pred"]

            self._fns[key] = jax.jit(fwd)
        return self._fns[key]

    def _prepare(self, rgb: np.ndarray, dep: np.ndarray):
        """Normalize + pad one (H, W, 3)/(H, W[, 1]) pair to its bucket."""
        if rgb.dtype == np.uint8:
            rgb = rgb.astype(np.float32) / 255.0
            rgb = (rgb - IMAGENET_MEAN) / IMAGENET_STD
        rgb = np.asarray(rgb, np.float32)
        dep = np.asarray(dep, np.float32)
        if dep.ndim == 2:
            dep = dep[..., None]
        h, w = rgb.shape[:2]
        hb, wb = _round_up(h, self.bucket), _round_up(w, self.bucket)
        # edge-pad rgb (keeps encoder statistics sane), zero-pad depth (no
        # fake observations; preserve_input never pins padded pixels).
        rgb_p = np.pad(rgb, ((0, hb - h), (0, wb - w), (0, 0)), mode="edge")
        dep_p = np.pad(dep, ((0, hb - h), (0, wb - w), (0, 0)))
        return rgb_p, dep_p, (h, w)

    # ---- public API ----------------------------------------------------
    def predict(self, rgb: np.ndarray, dep: np.ndarray) -> np.ndarray:
        """One image -> dense depth (H, W) float32."""
        return self.predict_batch([rgb], [dep])[0]

    def predict_batch(self, rgbs, deps) -> list:
        prepped = [self._prepare(r, d) for r, d in zip(rgbs, deps)]
        hb = max(p[0].shape[0] for p in prepped)
        wb = max(p[0].shape[1] for p in prepped)
        b = len(prepped)
        rgb = np.stack([np.pad(p[0], ((0, hb - p[0].shape[0]),
                                      (0, wb - p[0].shape[1]), (0, 0)),
                               mode="edge") for p in prepped])
        dep = np.stack([np.pad(p[1], ((0, hb - p[1].shape[0]),
                                      (0, wb - p[1].shape[1]), (0, 0)))
                        for p in prepped])
        fn = self._fn_for(b, hb, wb)
        pred = np.asarray(fn(self.variables,
                             {"rgb": jnp.asarray(rgb), "dep": jnp.asarray(dep)}))
        return [pred[i, :h, :w, 0] for i, (_, _, (h, w)) in enumerate(prepped)]

    def warmup(self, shapes=((228, 304),)):
        for (h, w) in shapes:
            self.predict(np.zeros((h, w, 3), np.float32),
                         np.zeros((h, w), np.float32))

    def benchmark(self, h: int = 228, w: int = 304, calls: int = 20):
        """Per-image latency (median wall-clock seconds after warmup)."""
        rgb = np.random.default_rng(0).standard_normal((h, w, 3)).astype(np.float32)
        dep = np.zeros((h, w), np.float32)
        self.predict(rgb, dep)
        times = []
        for _ in range(calls):
            t0 = time.perf_counter()
            out = self.predict(rgb, dep)
            times.append(time.perf_counter() - t0)
        times.sort()
        return {"median_s": times[len(times) // 2], "min_s": times[0],
                "mean_s": sum(times) / len(times)}
