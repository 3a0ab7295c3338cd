"""Dataset registry + base dataset.

Keeps the reference contract (/root/reference/src/data/__init__.py:19-43):
datasets are keyed by name and yield dict samples {'rgb','dep','gt','K'} —
but in NHWC numpy layout, feeding a threaded host-side loader
(`data/loader.py`) instead of torch DataLoader workers.
"""

from __future__ import annotations

import os

import numpy as np


def resolve_split_json(path: str) -> str:
    """Resolve a split-JSON path: as given if it exists, else (for relative
    paths) against the repo root, where ``data_json/`` is vendored — so the
    default ``--split_json data_json/nyu.json`` works from any cwd (the
    reference assumes cwd == repo root, src/config.py:37-40)."""
    if os.path.isfile(path) or os.path.isabs(path):
        return path
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cand = os.path.join(repo_root, path)
    return cand if os.path.isfile(cand) else path


class BaseDataset:
    """A map-style dataset: __len__ + __getitem__(idx, rng) -> sample dict.

    Samples are NHWC float32 numpy arrays:
      rgb (H, W, 3) ImageNet-normalized; dep/gt (H, W, 1) metric depth;
      K (4,) intrinsics [fx, fy, cx, cy].

    Randomness is *explicit*: __getitem__ takes a numpy Generator so the
    pipeline stays reproducible under sharding (reference leaves this to
    global torch RNG state).
    """

    def __init__(self, cfg, mode: str):
        if mode not in ("train", "val", "test"):
            raise NotImplementedError(f"mode {mode}")
        self.cfg = cfg
        self.mode = mode

    def __len__(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, idx, rng: np.random.Generator):  # pragma: no cover
        raise NotImplementedError


def get_sparse_depth(dep: np.ndarray, num_sample: int,
                     rng: np.random.Generator) -> np.ndarray:
    """Randomly keep `num_sample` valid depth pixels, zero the rest.

    Mirrors reference get_sparse_depth (nyu.py:164-182 / kittidc.py:303-321).
    dep: (H, W, 1).
    """
    flat = dep.reshape(-1)
    idx_nnz = np.flatnonzero(flat > 1e-4)
    if len(idx_nnz) > num_sample:
        idx_nnz = idx_nnz[rng.permutation(len(idx_nnz))[:num_sample]]
    mask = np.zeros_like(flat)
    mask[idx_nnz] = 1.0
    return (flat * mask).reshape(dep.shape)


def get_dataset(cfg, mode: str) -> BaseDataset:
    from nlspn_eccv20_tpu.data.kittidc import KITTIDC
    from nlspn_eccv20_tpu.data.nyu import NYU
    from nlspn_eccv20_tpu.data.synthetic import Synthetic

    registry = {"NYU": NYU, "KITTIDC": KITTIDC, "Synthetic": Synthetic}
    if cfg.data_name not in registry:
        raise NotImplementedError(f"dataset {cfg.data_name}")
    return registry[cfg.data_name](cfg, mode)
