"""Loss DSL + metric tests with torch-free golden values."""

import jax.numpy as jnp
import numpy as np
import pytest

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.losses import LossFunction, parse_loss_spec
from nlspn_eccv20_tpu.metrics import MetricFunction


def test_parse_loss_spec():
    assert parse_loss_spec("1.0*L1+1.0*L2") == [(1.0, "L1"), (1.0, "L2")]
    assert parse_loss_spec("0.5*L2") == [(0.5, "L2")]
    with pytest.raises(NotImplementedError):
        parse_loss_spec("1.0*Huber")


def test_l1_l2_golden():
    cfg = Config(loss="1.0*L1+1.0*L2", max_depth=10.0).finalize()
    loss = LossFunction(cfg)
    rng = np.random.default_rng(1)
    gt = rng.random((2, 4, 5, 1)) * 12 - 1     # includes <0 and >max_depth
    pred = rng.random((2, 4, 5, 1)) * 12 - 1
    total, vals = loss({"gt": jnp.asarray(gt, jnp.float32)},
                       {"pred": jnp.asarray(pred, jnp.float32)})

    gt_c = np.clip(gt, 0, 10.0)
    pred_c = np.clip(pred, 0, 10.0)
    mask = (gt_c > 1e-4).astype(np.float64)
    nv = mask.sum((1, 2, 3))
    l1 = (np.abs(pred_c - gt_c) * mask).sum((1, 2, 3)) / (nv + 1e-8)
    l2 = (((pred_c - gt_c) ** 2) * mask).sum((1, 2, 3)) / (nv + 1e-8)
    np.testing.assert_allclose(float(total), l1.sum() + l2.sum(), rtol=1e-5)
    assert vals.shape == (1, 3)
    np.testing.assert_allclose(np.asarray(vals)[0],
                               [l1.sum(), l2.sum(), l1.sum() + l2.sum()],
                               rtol=1e-5)
    assert loss.loss_name == ["L1", "L2", "Total"]


def test_metrics_golden():
    cfg = Config().finalize()
    metric = MetricFunction(cfg)
    rng = np.random.default_rng(2)
    gt = (rng.random((1, 6, 6, 1)) > 0.3) * rng.random((1, 6, 6, 1)) * 8
    pred = np.abs(rng.random((1, 6, 6, 1)) * 8)
    out = np.asarray(metric({"gt": jnp.asarray(gt, jnp.float32)},
                            {"pred": jnp.asarray(pred, jnp.float32)}))
    assert out.shape == (1, 8)

    m = gt > 1e-4
    nv = m.sum()
    p, g = pred[m], gt[m]
    rmse = np.sqrt((np.square(p - g)).sum() / nv)
    mae = np.abs(p - g).sum() / nv
    pinv = np.where(p <= 1e-4, 0, 1 / (p + 1e-8))
    ginv = 1 / (g + 1e-8)
    irmse = np.sqrt((np.square(pinv - ginv)).sum() / nv)
    rel = (np.abs(p - g) / g).sum() / nv
    ratio = np.maximum(g / (p + 1e-8), p / (g + 1e-8))
    d1 = (ratio < 1.25).sum() / nv

    np.testing.assert_allclose(out[0, 0], rmse, rtol=1e-4)
    np.testing.assert_allclose(out[0, 1], mae, rtol=1e-4)
    np.testing.assert_allclose(out[0, 2], irmse, rtol=1e-3)
    np.testing.assert_allclose(out[0, 4], rel, rtol=1e-4)
    np.testing.assert_allclose(out[0, 5], d1, rtol=1e-4)
    assert metric.metric_name[0] == "RMSE"


def test_perfect_prediction_metrics():
    cfg = Config().finalize()
    metric = MetricFunction(cfg)
    gt = np.ones((1, 4, 4, 1), np.float32) * 3
    out = np.asarray(metric({"gt": jnp.asarray(gt)}, {"pred": jnp.asarray(gt)}))
    np.testing.assert_allclose(out[0, :5], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 5:], 1.0, atol=1e-5)
