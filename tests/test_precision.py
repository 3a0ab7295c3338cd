"""bf16 mixed-precision tests: fp32 params, bfloat16 compute."""

import jax
import jax.numpy as jnp
import numpy as np

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.models import get_model


def _sample(b=1, h=32, w=48):
    rng = np.random.default_rng(0)
    gt = np.clip(rng.random((b, h, w, 1)) * 8, 0.1, None).astype(np.float32)
    return {
        "rgb": jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32),
        "dep": jnp.asarray(gt * (rng.random((b, h, w, 1)) > 0.9), jnp.float32),
        "gt": jnp.asarray(gt, jnp.float32),
    }


def test_bf16_params_stay_fp32_outputs_fp32():
    cfg = Config(patch_height=32, patch_width=48, prop_time=2,
                 precision="bf16", prop_impl="xla").finalize()
    model = get_model(cfg)
    s = _sample()
    variables = model.init(jax.random.PRNGKey(0), s, train=False)
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    out = model.apply(variables, s, train=False)
    assert out["pred"].dtype == jnp.float32  # propagation stays fp32
    assert np.isfinite(np.asarray(out["pred"])).all()


def test_bf16_close_to_fp32():
    s = _sample()
    preds = {}
    for prec in ("f32", "bf16"):
        cfg = Config(patch_height=32, patch_width=48, prop_time=2,
                     precision=prec, prop_impl="xla").finalize()
        model = get_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), s, train=False)
        preds[prec] = np.asarray(model.apply(variables, s, train=False)["pred"])
    # identical init; bf16 rounding only (untrained net, output scale ~1)
    np.testing.assert_allclose(preds["bf16"], preds["f32"], rtol=0.1, atol=0.05)


def test_bf16_grads_finite():
    cfg = Config(patch_height=32, patch_width=48, prop_time=2,
                 precision="bf16", prop_impl="xla").finalize()
    model = get_model(cfg)
    s = _sample()
    variables = model.init(jax.random.PRNGKey(0), s, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            s, train=True, mutable=["batch_stats"])
        return jnp.mean((out["pred"] - s["gt"]) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
        assert g.dtype == jnp.float32
