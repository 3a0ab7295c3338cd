"""Depth-completion metric suite.

The 8 metrics of the reference (/root/reference/src/metric/nlspnmetric.py:
27-93): RMSE, MAE, iRMSE, iMAE (inverse depth, 1/km convention when depth is
metric), REL, and delta < 1.25^{1,2,3}, computed over valid pixels
(gt > 1e-4). Pure-jnp and jit-safe (masking via where, not boolean
indexing).
"""

from __future__ import annotations

import jax.numpy as jnp

METRIC_NAMES = ["RMSE", "MAE", "iRMSE", "iMAE", "REL", "D^1", "D^2", "D^3"]
T_VALID = 1e-4


def evaluate(sample, output) -> jnp.ndarray:
    """Returns a (1, 8) array of metrics for the batch."""
    pred = output["pred"]
    gt = sample["gt"]

    mask = gt > T_VALID
    num_valid = jnp.sum(mask)
    fmask = mask.astype(pred.dtype)

    pred_inv = 1.0 / (pred + 1e-8)
    gt_inv = 1.0 / (gt + 1e-8)
    pred_inv = jnp.where(pred <= T_VALID, 0.0, pred_inv)
    gt_inv = jnp.where(gt <= T_VALID, 0.0, gt_inv)

    diff = (pred - gt) * fmask
    rmse = jnp.sqrt(jnp.sum(diff ** 2) / (num_valid + 1e-8))
    mae = jnp.sum(jnp.abs(diff)) / (num_valid + 1e-8)

    diff_inv = (pred_inv - gt_inv) * fmask
    irmse = jnp.sqrt(jnp.sum(diff_inv ** 2) / (num_valid + 1e-8))
    imae = jnp.sum(jnp.abs(diff_inv)) / (num_valid + 1e-8)

    rel = jnp.sum(jnp.abs(diff) / (gt + 1e-8) * fmask) / (num_valid + 1e-8)

    r1 = gt / (pred + 1e-8)
    r2 = pred / (gt + 1e-8)
    ratio = jnp.maximum(r1, r2)
    deltas = [
        jnp.sum((ratio < 1.25 ** p) * fmask) / (num_valid + 1e-8)
        for p in (1, 2, 3)
    ]

    return jnp.stack([rmse, mae, irmse, imae, rel] + deltas)[None, :]


def evaluate_per_sample(sample, output) -> jnp.ndarray:
    """Returns a (B, 8) array: the 8 metrics evaluated independently per
    image. Row-for-row identical to running :func:`evaluate` at batch 1
    (the reference's eval loop shape, main.py:342), which lets a sharded
    eval batch keep per-image metric accounting exact — padded rows are
    simply dropped by the caller."""
    pred = output["pred"]
    gt = sample["gt"]
    ax = (1, 2, 3)

    mask = gt > T_VALID
    num_valid = jnp.sum(mask, axis=ax)
    fmask = mask.astype(pred.dtype)

    pred_inv = 1.0 / (pred + 1e-8)
    gt_inv = 1.0 / (gt + 1e-8)
    pred_inv = jnp.where(pred <= T_VALID, 0.0, pred_inv)
    gt_inv = jnp.where(gt <= T_VALID, 0.0, gt_inv)

    diff = (pred - gt) * fmask
    rmse = jnp.sqrt(jnp.sum(diff ** 2, axis=ax) / (num_valid + 1e-8))
    mae = jnp.sum(jnp.abs(diff), axis=ax) / (num_valid + 1e-8)

    diff_inv = (pred_inv - gt_inv) * fmask
    irmse = jnp.sqrt(jnp.sum(diff_inv ** 2, axis=ax) / (num_valid + 1e-8))
    imae = jnp.sum(jnp.abs(diff_inv), axis=ax) / (num_valid + 1e-8)

    rel = jnp.sum(jnp.abs(diff) / (gt + 1e-8) * fmask, axis=ax) / (
        num_valid + 1e-8)

    r1 = gt / (pred + 1e-8)
    r2 = pred / (gt + 1e-8)
    ratio = jnp.maximum(r1, r2)
    deltas = [
        jnp.sum((ratio < 1.25 ** p) * fmask, axis=ax) / (num_valid + 1e-8)
        for p in (1, 2, 3)
    ]

    return jnp.stack([rmse, mae, irmse, imae, rel] + deltas, axis=-1)


class MetricFunction:
    def __init__(self, cfg):
        self.cfg = cfg
        self.metric_name = list(METRIC_NAMES)

    def __call__(self, sample, output):
        return evaluate(sample, output)


def get_metric(cfg):
    if cfg.model_name != "NLSPN":
        raise NotImplementedError(cfg.model_name)
    return MetricFunction(cfg)
