"""Hermetic NYU pipeline test: tiny on-disk HDF5 tree."""

import json
import os

import h5py
import numpy as np
import pytest

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.data import get_dataset
from nlspn_eccv20_tpu.data.nyu import K_NYU


@pytest.fixture
def nyu_tree(tmp_path):
    root = tmp_path / "nyu"
    rng = np.random.default_rng(0)
    entries = {"train": [], "val": [], "test": []}
    for split, sub in (("train", "train/room_0001"), ("val", "train/room_0002"),
                       ("test", "val/official")):
        d = root / sub
        d.mkdir(parents=True)
        for i in range(2):
            fn = f"{i:05d}.h5"
            # native NYU frames are 480x640; use a smaller but same-aspect raw
            rgb = rng.integers(0, 256, (3, 480, 640), dtype=np.uint8)
            dep = (rng.random((480, 640)) * 9 + 0.5).astype(np.float32)
            with h5py.File(d / fn, "w") as f:
                f.create_dataset("rgb", data=rgb)
                f.create_dataset("depth", data=dep)
            entries[split].append({"filename": f"{sub}/{fn}"})
    sj = tmp_path / "nyu.json"
    with open(sj, "w") as f:
        json.dump(entries, f)
    return str(root), str(sj)


def _cfg(root, sj, **kw):
    base = dict(data_name="NYU", dir_data=root, split_json=sj,
                patch_height=228, patch_width=304, max_depth=10.0,
                num_sample=100)
    base.update(kw)
    return Config(**base).finalize()


def test_train_sample_geometry(nyu_tree):
    root, sj = nyu_tree
    ds = get_dataset(_cfg(root, sj), "train")
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert s["rgb"].shape == (228, 304, 3)
    assert s["dep"].shape == (228, 304, 1)
    assert (s["dep"] > 0).sum() == 100
    # scale augmentation divides depth and multiplies fx/fy
    assert s["K"][0] >= K_NYU[0] - 1e-5


def test_eval_deterministic(nyu_tree):
    root, sj = nyu_tree
    ds = get_dataset(_cfg(root, sj), "test")
    a = ds.__getitem__(0, np.random.default_rng(1))
    b = ds.__getitem__(0, np.random.default_rng(1))
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    np.testing.assert_array_equal(a["dep"], b["dep"])
    np.testing.assert_allclose(a["K"], K_NYU)


def test_eval_depth_range_preserved(nyu_tree):
    root, sj = nyu_tree
    ds = get_dataset(_cfg(root, sj, augment=False), "val")
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert float(s["gt"].min()) >= 0.0
    assert float(s["gt"].max()) <= 10.5  # bilinear resize stays in range


def test_loader_integration(nyu_tree):
    from nlspn_eccv20_tpu.data.loader import DataLoader

    root, sj = nyu_tree
    ds = get_dataset(_cfg(root, sj), "train")
    dl = DataLoader(ds, 2, shuffle=True, drop_last=True, seed=0, num_threads=2)
    batches = list(dl)
    assert len(batches) == 1
    assert batches[0]["rgb"].shape == (2, 228, 304, 3)
