"""Summary/artifact tests: text logs, KITTI submission PNGs, visualizations."""

import os

import numpy as np
import pytest
from PIL import Image

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.summary import Summary, get_summary


def _cfg(tmp_path, **kw):
    return Config(save_dir=str(tmp_path / "exp"), max_depth=10.0,
                  **kw).finalize()


def _fake(b=2, h=8, w=12):
    rng = np.random.default_rng(0)
    sample = {
        "rgb": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "dep": (rng.random((b, h, w, 1)) * 5).astype(np.float32),
        "gt": (rng.random((b, h, w, 1)) * 5).astype(np.float32),
    }
    output = {
        "pred": (rng.random((b, h, w, 1)) * 5).astype(np.float32),
        "pred_init": (rng.random((b, h, w, 1)) * 5).astype(np.float32),
        "pred_inter": [(rng.random((b, h, w, 1)) * 5).astype(np.float32)],
        "confidence": rng.random((b, h, w, 1)).astype(np.float32),
        "aff": rng.random((b, h, w, 9)).astype(np.float32),
        "offset": None,
        "gamma": np.asarray([4.0], np.float32),
    }
    return sample, output


def test_scalar_logs_written(tmp_path):
    cfg = _cfg(tmp_path)
    s = get_summary(cfg, "train", ["L1", "L2", "Total"],
                    ["RMSE", "MAE", "iRMSE", "iMAE", "REL", "D^1", "D^2", "D^3"])
    s.add(loss=np.asarray([[1.0, 2.0, 3.0]]),
          metric=np.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], np.float32))
    s.add(loss=np.asarray([[3.0, 4.0, 7.0]]),
          metric=np.asarray([[2, 3, 4, 5, 6, 7, 8, 9]], np.float32))
    result = s.update(1)
    assert result["loss/L1"] == pytest.approx(2.0)
    assert result["RMSE"] == pytest.approx(1.5)
    with open(os.path.join(cfg.save_dir, "loss_train.txt")) as f:
        assert "L1" in f.read()
    with open(os.path.join(cfg.save_dir, "metric_train.txt")) as f:
        assert "RMSE" in f.read()
    # accumulators reset after update
    assert s.update(2) == {}
    s.close()


def test_kitti_submission_png_roundtrip(tmp_path):
    """pred -> uint16(pred*256) -> /256 must be lossless to 1/256 m."""
    cfg = _cfg(tmp_path, save_result_only=True)
    s = get_summary(cfg, "test", None, ["RMSE"])
    s.setup_output_dir(0)
    sample, output = _fake(b=1)
    s.save(0, 7, sample, output)
    path = os.path.join(s.path_output, f"{7:010d}.png")
    assert os.path.exists(path)
    img = np.array(Image.open(path))
    assert img.dtype == np.uint16
    decoded = img.astype(np.float32) / 256.0
    np.testing.assert_allclose(decoded, output["pred"][0, ..., 0], atol=1 / 256)
    s.close()


def test_visualization_dump(tmp_path):
    cfg = _cfg(tmp_path, save_image=True)
    s = get_summary(cfg, "test", None, ["RMSE"])
    s.setup_output_dir(3)
    sample, output = _fake(b=1)
    s.save(3, 0, sample, output)
    # reference layout (nlspnsummary.py:183-268): epoch%04d/%08d/ per-image
    # dirs with fixed artifact names
    out_dir = os.path.join(s.path_output, "00000000")
    files = os.listdir(out_dir)
    for expected in ("01_rgb.png", "02_dep.png", "03_pred_init.png",
                     "04_pred_prop_00.png", "05_pred_final.png",
                     "05_pred_final_gray.png", "06_gt.png",
                     "aff.npy", "gamma.npy"):
        assert expected in files, (expected, files)
    s.close()
