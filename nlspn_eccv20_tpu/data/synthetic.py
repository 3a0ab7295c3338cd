"""Synthetic depth-completion dataset for hermetic end-to-end tests.

The reference has no hermetic test data (SURVEY.md section 4); this dataset
makes `--test_pipeline`-style smoke runs and unit tests self-contained:
procedurally generated smooth depth surfaces + a correlated RGB rendering,
deterministic per (split, index).
"""

from __future__ import annotations

import numpy as np

from nlspn_eccv20_tpu.data import BaseDataset, get_sparse_depth


class Synthetic(BaseDataset):
    SPLIT_SIZES = {"train": 32, "val": 8, "test": 8}

    def __init__(self, cfg, mode):
        super().__init__(cfg, mode)
        self.h = cfg.patch_height
        self.w = cfg.patch_width

    def __len__(self):
        return self.SPLIT_SIZES[self.mode]

    def __getitem__(self, idx, rng: np.random.Generator):
        # Deterministic scene per (split, idx); `rng` only drives sampling.
        seed = {"train": 0, "val": 10_000, "test": 20_000}[self.mode] + idx
        srng = np.random.default_rng(seed)
        h, w = self.h, self.w

        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        yy /= max(h - 1, 1)
        xx /= max(w - 1, 1)
        depth = np.full((h, w), 0.3 * self.cfg.max_depth, np.float32)
        for _ in range(4):  # a few random smooth bumps / ramps
            cy, cx = srng.uniform(0, 1, 2)
            amp = srng.uniform(-0.2, 0.2) * self.cfg.max_depth
            sig = srng.uniform(0.1, 0.5)
            depth += amp * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2))
        depth += srng.uniform(0.05, 0.3) * self.cfg.max_depth * xx
        depth = np.clip(depth, 0.1, self.cfg.max_depth).astype(np.float32)

        # RGB correlated with depth + texture, already "normalized"-scale.
        rgb = np.stack([
            depth / self.cfg.max_depth,
            1.0 - depth / self.cfg.max_depth,
            0.5 + 0.1 * srng.standard_normal((h, w)).astype(np.float32),
        ], axis=-1)
        rgb = ((rgb - 0.5) * 2.0).astype(np.float32)

        gt = depth[..., None]
        num = self.cfg.num_sample if self.cfg.num_sample > 0 else 500
        dep_sp = get_sparse_depth(gt, num, rng)

        K = np.asarray([w, w, w / 2.0, h / 2.0], np.float32)
        return {"rgb": rgb, "dep": dep_sp, "gt": gt, "K": K}
