"""Loss library with the reference's weighted-spec DSL.

``"1.0*L1+1.0*L2"`` parses into weighted submodules; evaluation returns
``(loss_sum, per_loss_values)`` with a trailing 'Total' entry
(reference /root/reference/src/loss/__init__.py:40-77, nlspnloss.py:29-56).
All losses are pure jnp functions (jit/grad-safe).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp

T_VALID = 1e-4


def _masked_mean_vec(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B,) per-sample mean over valid pixels (reference l1loss.py:33-41)."""
    d = jnp.sum(err * mask, axis=(1, 2, 3))
    num_valid = jnp.sum(mask, axis=(1, 2, 3))
    return d / (num_valid + 1e-8)


def _masked_per_sample_mean(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean over valid pixels, summed over the batch.

    Matches reference l1loss.py:33-41 / l2loss.py exactly.
    """
    return jnp.sum(_masked_mean_vec(err, mask))


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, max_depth: float) -> jnp.ndarray:
    gt_c = jnp.clip(gt, 0.0, max_depth)
    pred_c = jnp.clip(pred, 0.0, max_depth)
    mask = (gt_c > T_VALID).astype(pred_c.dtype)
    return _masked_per_sample_mean(jnp.abs(pred_c - gt_c), mask)


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray, max_depth: float) -> jnp.ndarray:
    gt_c = jnp.clip(gt, 0.0, max_depth)
    pred_c = jnp.clip(pred, 0.0, max_depth)
    mask = (gt_c > T_VALID).astype(pred_c.dtype)
    return _masked_per_sample_mean((pred_c - gt_c) ** 2, mask)


_LOSS_FNS: Dict[str, Callable] = {"L1": l1_loss, "L2": l2_loss}


def parse_loss_spec(spec: str) -> List[Tuple[float, str]]:
    """Parse ``"1.0*L1+0.5*L2"`` -> [(1.0, 'L1'), (0.5, 'L2')]."""
    terms = []
    for part in spec.split("+"):
        weight, name = part.split("*")
        name = name.strip()
        if name not in _LOSS_FNS:
            raise NotImplementedError(f"unknown loss {name}")
        terms.append((float(weight), name))
    return terms


class LossFunction:
    """Compiled weighted-loss evaluator keyed by the loss spec DSL.

    __call__(sample, output) -> (loss_sum, loss_values) where loss_values is
    a (1, num_terms + 1) array [w1*l1, ..., total] matching the reference
    summary layout (loss/__init__.py:58-66, nlspnloss.py:39-56).
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.terms = parse_loss_spec(cfg.loss)
        self.loss_name = [name for _, name in self.terms] + ["Total"]

    def __call__(self, sample, output):
        pred = output["pred"]
        gt = sample["gt"]
        vals = []
        total = jnp.zeros((), pred.dtype)
        for weight, name in self.terms:
            v = weight * _LOSS_FNS[name](pred, gt, self.cfg.max_depth)
            vals.append(v)
            total = total + v
        loss_val = jnp.stack(vals + [total])[None, :]
        return total, loss_val

    def per_sample(self, sample, output) -> jnp.ndarray:
        """(B, num_terms + 1) per-image weighted loss values. Summing a
        column over the batch reproduces ``__call__``'s scalars; per-image
        rows let a sharded eval batch drop padded entries exactly."""
        pred = output["pred"]
        gt = sample["gt"]
        gt_c = jnp.clip(gt, 0.0, self.cfg.max_depth)
        pred_c = jnp.clip(pred, 0.0, self.cfg.max_depth)
        mask = (gt_c > T_VALID).astype(pred_c.dtype)
        errs = {"L1": jnp.abs(pred_c - gt_c), "L2": (pred_c - gt_c) ** 2}
        vals = []
        for weight, name in self.terms:
            vals.append(weight * _masked_mean_vec(errs[name], mask))
        total = sum(vals)
        return jnp.stack(vals + [total], axis=-1)


def get_loss(cfg):
    if cfg.model_name != "NLSPN":
        raise NotImplementedError(cfg.model_name)
    return LossFunction(cfg)
