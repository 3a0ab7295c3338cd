"""Experiment summaries: scalars, text logs, TensorBoard, image artifacts.

Mirrors the reference summary stack (/root/reference/src/summary/):
  * epoch-mean loss/metric scalars -> console + append-only
    ``loss_{mode}.txt`` / ``metric_{mode}.txt`` (+ TensorBoard when
    available) — BaseSummary/__init__.py:34-76, nlspnsummary.py:50-91.
  * rgb | sparse-depth | pred | gt | confidence image grids with a plasma
    colormap (nlspnsummary.py:93-155).
  * test artifacts: KITTI submission PNGs ``uint16(pred * 256)`` when
    ``save_result_only`` (nlspnsummary.py:165-182), else full visualization
    dumps incl. per-iteration predictions and offset/aff/gamma ``.npy``
    (:183-268).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

try:  # TensorBoard is optional
    from torch.utils.tensorboard import SummaryWriter  # type: ignore

    _TB = True
except Exception:  # pragma: no cover
    _TB = False


def _host_local(x) -> np.ndarray:
    """Materialize an array on host. For sharded jax.Arrays that are not
    fully addressable (multi-host), returns the locally-addressable batch
    shards — enough for rank-0 image grids without a cross-host gather."""
    if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def _unnormalize_rgb(rgb: np.ndarray) -> np.ndarray:
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    return np.clip(rgb * std + mean, 0, 1)


def _colormap(x: np.ndarray, vmax: float, cmap: str = "plasma") -> np.ndarray:
    """(H, W) -> (H, W, 3) uint8 via matplotlib colormap."""
    import matplotlib

    norm = np.clip(x / max(vmax, 1e-8), 0, 1)
    return (matplotlib.colormaps[cmap](norm)[..., :3] * 255).astype(np.uint8)


class Summary:
    def __init__(self, log_dir: str, mode: str, cfg, loss_name: Optional[List[str]],
                 metric_name: List[str]):
        self.mode = mode
        self.cfg = cfg
        self.loss_name = loss_name
        self.metric_name = metric_name
        self.log_dir = os.path.join(log_dir, mode)
        os.makedirs(self.log_dir, exist_ok=True)
        self.path_output = None

        self._loss: List[np.ndarray] = []
        self._metric: List[np.ndarray] = []
        self._tb = SummaryWriter(log_dir=self.log_dir) if _TB else None

        if loss_name is not None:
            self.f_loss = os.path.join(log_dir, f"loss_{mode}.txt")
        else:
            self.f_loss = None
        self.f_metric = os.path.join(log_dir, f"metric_{mode}.txt")

    # ---- accumulation (reference BaseSummary.add) ----
    def add(self, loss: Optional[np.ndarray] = None,
            metric: Optional[np.ndarray] = None):
        if loss is not None:
            self._loss.append(np.asarray(loss))
        if metric is not None:
            self._metric.append(np.asarray(metric))

    def scalar(self, name: str, value: float, epoch: int):
        """Ad-hoc TB scalar (e.g. Etc/max_offset telemetry)."""
        if self._tb:
            self._tb.add_scalar(name, float(value), epoch)

    # ---- epoch-end scalars (reference NLSPNSummary.update) ----
    def update(self, epoch: int, sample=None, output=None) -> Dict[str, float]:
        result = {}
        if self._loss and self.loss_name:
            mean = np.concatenate(self._loss, axis=0).mean(axis=0)
            msg = " | ".join(f"{n}: {v:8.4f}" for n, v in zip(self.loss_name, mean))
            print(f"{self.mode} epoch {epoch:04d} | Loss   | {msg}")
            with open(self.f_loss, "a") as f:
                f.write(f"{epoch:04d} | {msg}\n")
            if self._tb:
                for n, v in zip(self.loss_name, mean):
                    self._tb.add_scalar(f"Loss/{n}", float(v), epoch)
            result.update({f"loss/{n}": float(v) for n, v in zip(self.loss_name, mean)})
        if self._metric:
            mean = np.concatenate(self._metric, axis=0).mean(axis=0)
            msg = " | ".join(f"{n}: {v:9.5f}" for n, v in zip(self.metric_name, mean))
            print(f"{self.mode} epoch {epoch:04d} | Metric | {msg}")
            with open(self.f_metric, "a") as f:
                f.write(f"{epoch:04d} | {msg}\n")
            if self._tb:
                for n, v in zip(self.metric_name, mean):
                    self._tb.add_scalar(f"Metric/{n}", float(v), epoch)
            result.update({n: float(v) for n, v in zip(self.metric_name, mean)})

        if self._tb and output is not None and "gamma" in output and output["gamma"] is not None:
            self._tb.add_scalar("Etc/gamma", float(_host_local(output["gamma"]).ravel()[0]), epoch)

        if sample is not None and output is not None and self._tb:
            self._tb_images(epoch, sample, output)

        self._loss.clear()
        self._metric.clear()
        if self._tb:
            self._tb.flush()
        return result

    def _tb_images(self, epoch: int, sample, output):
        n = min(self.cfg.num_summary, _host_local(sample["rgb"]).shape[0])
        rows = []
        rgb = _unnormalize_rgb(_host_local(sample["rgb"])[:n])
        dep = _host_local(sample["dep"])[:n, ..., 0]
        gt = _host_local(sample["gt"])[:n, ..., 0]
        pred = _host_local(output["pred"])[:n, ..., 0]
        vmax = self.cfg.max_depth
        for i in range(n):
            row = [
                (rgb[i] * 255).astype(np.uint8),
                _colormap(dep[i], vmax),
                _colormap(pred[i], vmax),
                _colormap(gt[i], vmax),
            ]
            if output.get("confidence") is not None:
                conf = _host_local(output["confidence"])[i, ..., 0]
                row.append(_colormap(conf, 1.0, "gray"))
            rows.append(np.concatenate(row, axis=1))
        grid = np.concatenate(rows, axis=0)
        self._tb.add_image(f"{self.mode}/images", grid, epoch, dataformats="HWC")

    # ---- test artifacts (reference NLSPNSummary.save) ----
    def setup_output_dir(self, epoch: int):
        self.path_output = os.path.join(self.log_dir, f"epoch{epoch:04d}")
        os.makedirs(self.path_output, exist_ok=True)

    def save(self, epoch: int, idx: int, sample, output, batch_index: int = 0):
        """Per-image artifact dump, matching the reference layout exactly
        (nlspnsummary.py:165-268): ``epoch%04d/%010d.png`` submission PNGs
        when ``save_result_only``; otherwise a per-image directory
        ``epoch%04d/%08d/`` with 01_rgb / 02_dep / 03_pred_init /
        04_pred_prop_%02d / 05_pred_final(+_gray) / 06_gt PNGs plus
        offset/aff/gamma ``.npy``.

        ``batch_index`` selects the image inside a (possibly sharded) eval
        batch; the reference always ran eval at batch 1.
        """
        from PIL import Image

        if self.path_output is None:
            self.setup_output_dir(epoch)

        b = batch_index
        if self.cfg.save_result_only:
            # KITTI submission format: 16-bit PNG, clamp(pred) * 256
            # (reference nlspnsummary.py:172-182; README.md:302).
            pred = np.clip(_host_local(output["pred"])[b, ..., 0], 0, None)
            img = (pred * 256.0).astype(np.uint16)
            Image.fromarray(img).save(
                os.path.join(self.path_output, f"{idx:010d}.png"))
            return

        out_dir = os.path.join(self.path_output, f"{idx:08d}")
        os.makedirs(out_dir, exist_ok=True)
        vmax = self.cfg.max_depth

        def _save_cm(arr, name):
            Image.fromarray(_colormap(arr, vmax)).save(
                os.path.join(out_dir, name))

        rgb = (_unnormalize_rgb(_host_local(sample["rgb"])[b]) * 255).astype(
            np.uint8)
        Image.fromarray(rgb).save(os.path.join(out_dir, "01_rgb.png"))
        _save_cm(_host_local(sample["dep"])[b, ..., 0], "02_dep.png")
        pred = np.clip(_host_local(output["pred"])[b, ..., 0], 0, None)
        _save_cm(pred, "05_pred_final.png")
        # grayscale final pred (reference 05_pred_final_gray.png)
        gray = (np.clip(pred / max(vmax, 1e-8), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(gray).save(
            os.path.join(out_dir, "05_pred_final_gray.png"))
        _save_cm(_host_local(sample["gt"])[b, ..., 0], "06_gt.png")
        if output.get("pred_init") is not None:
            _save_cm(_host_local(output["pred_init"])[b, ..., 0],
                     "03_pred_init.png")
        # empty list = per-iteration preds not collected (need_inter=False
        # fast path, models/nlspn.py) — skip rather than mislabel.
        if output.get("pred_inter"):
            for t, p in enumerate(output["pred_inter"]):
                _save_cm(_host_local(p)[b, ..., 0],
                         f"04_pred_prop_{t:02d}.png")
        if output.get("offset") is not None:
            np.save(os.path.join(out_dir, "offset.npy"),
                    _host_local(output["offset"])[b:b + 1])
        np.save(os.path.join(out_dir, "aff.npy"),
                _host_local(output["aff"])[b:b + 1])
        np.save(os.path.join(out_dir, "gamma.npy"),
                _host_local(output["gamma"]))

    def close(self):
        if self._tb:
            self._tb.close()


def get_summary(cfg, mode: str, loss_name, metric_name) -> Summary:
    return Summary(cfg.save_dir, mode, cfg, loss_name, metric_name)
