"""Optimizer-factory parity vs torch.optim (reference utility.py:50-84).

The reference trains with torch SGD(momentum) / Adam / RMSprop under a
LambdaLR piecewise decay. Our optax chains must produce the same parameter
trajectories on identical gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.utils.optim import make_lr_schedule, make_optimizer


def _trajectories(name, steps=12, lr=0.05):
    """Run `steps` updates of optimizer `name` on the same quadratic in
    torch and optax; return both parameter trajectories."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(6).astype(np.float32)
    target = rng.standard_normal(6).astype(np.float32)

    # constant-lr config: one epoch boundary far away, no warm-up
    cfg = Config(optimizer=name, lr=lr, warm_up=False,
                 decay="1000", gamma="1.0").finalize()
    tx, _ = make_optimizer(cfg, steps_per_epoch=10_000)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((p - jnp.asarray(target)) ** 2)

    ours = []
    for _ in range(steps):
        g = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        ours.append(np.asarray(params))

    wt = torch.nn.Parameter(torch.tensor(w0))
    tt = torch.tensor(target)
    if name == "SGD":
        topt = torch.optim.SGD([wt], lr=lr, momentum=cfg.momentum)
    elif name == "ADAM":
        topt = torch.optim.Adam([wt], lr=lr, betas=cfg.betas,
                                eps=cfg.epsilon)
    else:
        topt = torch.optim.RMSprop([wt], lr=lr, eps=cfg.epsilon)
    theirs = []
    for _ in range(steps):
        topt.zero_grad()
        torch.sum((wt - tt) ** 2).backward()
        topt.step()
        theirs.append(wt.detach().numpy().copy())
    return ours, theirs


@pytest.mark.parametrize("name", ["SGD", "ADAM", "RMSprop"])
def test_optimizer_matches_torch(name):
    ours, theirs = _trajectories(name)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-6)


def test_lr_schedule_warmup_and_decay():
    """Epoch-1 linear ramp (main.py:214-220) + piecewise decay factor
    (utility.py:22-33): first boundary with epoch < d wins."""
    cfg = Config(lr=1.0, warm_up=True, decay="3,5", gamma="1.0,0.1").finalize()
    sched = make_lr_schedule(cfg, steps_per_epoch=4)
    # epoch 1 (steps 0..3): ramp (i+1)/4 * factor(1)=1.0
    np.testing.assert_allclose(
        [float(sched(i)) for i in range(4)], [0.25, 0.5, 0.75, 1.0])
    assert float(sched(4)) == 1.0          # epoch 2 < 3 -> 1.0
    # reference LRFactor: first d with epoch < d wins; epoch 3 -> d=5, g=0.1
    np.testing.assert_allclose(float(sched(8)), 0.1)
    np.testing.assert_allclose(float(sched(16)), 0.1)  # beyond last -> last gamma
