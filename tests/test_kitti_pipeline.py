"""Hermetic KITTI DC pipeline test: a tiny on-disk KITTI-format tree."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.data import get_dataset


H_RAW, W_RAW = 80, 120


@pytest.fixture
def kitti_tree(tmp_path):
    root = tmp_path / "kitti"
    rng = np.random.default_rng(0)
    date = "2011_09_26"
    seq = f"{date}_drive_0001_sync"

    entries = {"train": [], "val": [], "test": []}
    for split in ("train", "val"):
        base = root / split / seq
        (base / "image_02" / "data").mkdir(parents=True)
        (base / "proj_depth" / "velodyne_raw" / "image_02").mkdir(parents=True)
        (base / "proj_depth" / "groundtruth" / "image_02").mkdir(parents=True)
        for i in range(3):
            fn = f"{i:010d}.png"
            rgb = rng.integers(0, 256, (H_RAW, W_RAW, 3), dtype=np.uint8)
            Image.fromarray(rgb).save(base / "image_02" / "data" / fn)
            gt = (rng.random((H_RAW, W_RAW)) * 80 * 256).astype(np.uint16)
            Image.fromarray(gt).save(
                base / "proj_depth" / "groundtruth" / "image_02" / fn)
            sparse = gt * (rng.random((H_RAW, W_RAW)) > 0.9)
            Image.fromarray(sparse.astype(np.uint16)).save(
                base / "proj_depth" / "velodyne_raw" / "image_02" / fn)
            entries[split].append({
                "rgb": f"{split}/{seq}/image_02/data/{fn}",
                "depth": f"{split}/{seq}/proj_depth/velodyne_raw/image_02/{fn}",
                "gt": f"{split}/{seq}/proj_depth/groundtruth/image_02/{fn}",
                "K": f"{date}/calib_cam_to_cam.txt",
            })

    # calib file with P_rect_02/03
    (root / date).mkdir(parents=True)
    P = "7.215377e+02 0.000000e+00 6.095593e+01 4.485728e+01 " \
        "0.000000e+00 7.215377e+02 4.728540e+01 2.163791e-01 " \
        "0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03"
    with open(root / date / "calib_cam_to_cam.txt", "w") as f:
        f.write(f"P_rect_02: {P}\nP_rect_03: {P}\n")

    # test split (depth_selection-style, per-image intrinsics txt)
    sel = root / "depth_selection" / "val_selection_cropped"
    for sub in ("image", "velodyne_raw", "groundtruth_depth", "intrinsics"):
        (sel / sub).mkdir(parents=True)
    fn = "0000000000.png"
    Image.fromarray(rng.integers(0, 256, (H_RAW, W_RAW, 3), dtype=np.uint8)).save(
        sel / "image" / fn)
    gt = (rng.random((H_RAW, W_RAW)) * 80 * 256).astype(np.uint16)
    Image.fromarray(gt).save(sel / "groundtruth_depth" / fn)
    Image.fromarray((gt * 0.1).astype(np.uint16)).save(sel / "velodyne_raw" / fn)
    with open(sel / "intrinsics" / "0000000000.txt", "w") as f:
        f.write("721.5 0.0 60.9 0.0 721.5 47.2 0.0 0.0 1.0")
    entries["test"].append({
        "rgb": "depth_selection/val_selection_cropped/image/" + fn,
        "depth": "depth_selection/val_selection_cropped/velodyne_raw/" + fn,
        "gt": "depth_selection/val_selection_cropped/groundtruth_depth/" + fn,
        "K": "depth_selection/val_selection_cropped/intrinsics/0000000000.txt",
    })

    split_json = tmp_path / "split.json"
    with open(split_json, "w") as f:
        json.dump(entries, f)
    return str(root), str(split_json)


def _cfg(root, split_json, **kw):
    base = dict(data_name="KITTIDC", dir_data=root, split_json=split_json,
                patch_height=48, patch_width=96, top_crop=8, max_depth=90.0,
                num_sample=0)
    base.update(kw)
    return Config(**base).finalize()


def test_train_sample(kitti_tree):
    root, sj = kitti_tree
    ds = get_dataset(_cfg(root, sj), "train")
    assert len(ds) == 3
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert s["rgb"].shape == (48, 96, 3)
    assert s["dep"].shape == (48, 96, 1)
    assert s["gt"].shape == (48, 96, 1)
    assert s["K"].shape == (4,)
    assert (s["gt"] >= 0).all()
    # sparse input must be sparser than gt
    assert (s["dep"] > 0).sum() < (s["gt"] > 0).sum()


def test_val_deterministic_geometry(kitti_tree):
    root, sj = kitti_tree
    ds = get_dataset(_cfg(root, sj, augment=False), "val")
    a = ds.__getitem__(1, np.random.default_rng(5))
    b = ds.__getitem__(1, np.random.default_rng(5))
    np.testing.assert_array_equal(a["gt"], b["gt"])


def test_test_mode_full_image_and_crop(kitti_tree):
    root, sj = kitti_tree
    ds = get_dataset(_cfg(root, sj), "test")
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert s["gt"].shape == (H_RAW, W_RAW, 1)  # no crop by default
    ds2 = get_dataset(_cfg(root, sj, test_crop=True), "test")
    s2 = ds2.__getitem__(0, np.random.default_rng(0))
    assert s2["gt"].shape == (H_RAW - 8, W_RAW, 1)  # top_crop applied
    # cy shifted by the crop
    assert s2["K"][3] == pytest.approx(s["K"][3] - 8)


def test_num_sample_subsampling(kitti_tree):
    root, sj = kitti_tree
    ds = get_dataset(_cfg(root, sj, num_sample=20, augment=False), "val")
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert (s["dep"] > 0).sum() <= 20


def test_hflip_adjusts_cx(kitti_tree):
    """With augmentation, cx must track the flip (K[2] -> W - cx)."""
    root, sj = kitti_tree
    ds = get_dataset(_cfg(root, sj), "train")
    # find two rngs with opposite flip decisions
    ks = []
    for seed in range(6):
        s = ds.__getitem__(0, np.random.default_rng(seed))
        ks.append(float(s["K"][2]))
    assert len(set(np.round(ks, 3))) > 1  # flips/crops vary cx
