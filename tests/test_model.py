"""Shape/behavior parity tests for the NLSPN model.

Checks the architecture trace of SURVEY.md section 2.2: channel widths,
resolutions, head outputs, zero-init affinity behavior, and the ablation
surface (GRU/S2D/conf/offset/affinity modes, resnet18/34).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.models import get_model


def _sample(b=1, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    dep = (rng.random((b, h, w, 1)) > 0.9) * rng.random((b, h, w, 1)) * 5
    return {
        "rgb": jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32),
        "dep": jnp.asarray(dep, jnp.float32),
    }


def _run(cfg, sample=None, train=False):
    cfg = cfg.finalize()
    model = get_model(cfg)
    sample = sample or _sample()
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    if train:
        out, _ = model.apply(variables, sample, train=True,
                             mutable=["batch_stats"])
    else:
        out = model.apply(variables, sample, train=False)
    return out, variables


class TestDefaultConfig:
    def test_shapes_and_outputs(self):
        out, _ = _run(Config(prop_time=3, prop_impl="xla"))
        assert out["pred"].shape == (1, 32, 48, 1)
        assert out["pred_init"].shape == (1, 32, 48, 1)
        assert len(out["pred_inter"]) == 3
        assert out["aff"].shape == (1, 32, 48, 9)
        assert out["confidence"].shape == (1, 32, 48, 1)
        assert out["offset"] is None
        assert float(out["gamma"][0]) == pytest.approx(0.5 * 8)

    def test_zero_init_gives_uniform_affinity(self):
        """zero-init affinity head -> tanh(0)=0 -> center=1, uniform after GRU0."""
        out, _ = _run(Config(prop_time=1, use_GRU=False, prop_impl="xla"))
        aff = np.asarray(out["aff"])
        np.testing.assert_allclose(aff.sum(-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(aff[..., 4], 1.0, atol=1e-5)
        np.testing.assert_allclose(aff[..., :4], 0.0, atol=1e-6)

    def test_preserve_input_keeps_observed_pixels(self):
        s = _sample()
        out, _ = _run(Config(prop_time=2, prop_impl="xla"), sample=s)
        dep = np.asarray(s["dep"])
        m = dep > 0
        np.testing.assert_allclose(np.asarray(out["pred"])[m], dep[m],
                                   rtol=1e-5)

    def test_pred_nonnegative(self):
        out, _ = _run(Config(prop_time=2, prop_impl="xla"))
        assert float(jnp.min(out["pred"])) >= 0.0


class TestAblationSurface:
    @pytest.mark.parametrize("affinity", ["AS", "ASS", "TC", "TGASS"])
    def test_affinity_modes(self, affinity):
        out, _ = _run(Config(prop_time=2, use_GRU=False, affinity=affinity,
                             prop_impl="xla"))
        assert out["pred"].shape == (1, 32, 48, 1)

    def test_no_gru_no_s2d_no_conf(self):
        out, _ = _run(Config(prop_time=2, use_GRU=False, use_S2D=False,
                             conf_prop=False, prop_impl="xla"))
        assert out["confidence"] is None

    def test_offset_path(self):
        out, _ = _run(Config(prop_time=2, offset=True, use_GRU=False,
                             prop_impl="xla"))
        assert out["offset"].shape == (1, 32, 48, 18)
        pairs = np.asarray(out["offset"]).reshape(1, 32, 48, 9, 2)
        np.testing.assert_allclose(pairs[..., 4, :], 0.0)

    def test_resnet34(self):
        out, vars34 = _run(Config(prop_time=1, use_GRU=False,
                                  network="resnet34", prop_impl="xla"))
        _, vars18 = _run(Config(prop_time=1, use_GRU=False,
                                network="resnet18", prop_impl="xla"))
        n34 = sum(x.size for x in jax.tree.leaves(vars34["params"]))
        n18 = sum(x.size for x in jax.tree.leaves(vars18["params"]))
        assert n34 > n18

    def test_no_preserve(self):
        s = _sample()
        out, _ = _run(Config(prop_time=2, preserve_input=False,
                             prop_impl="xla"), sample=s)
        dep = np.asarray(s["dep"])
        m = dep > 0
        # without preservation the prediction generally differs at inputs
        assert not np.allclose(np.asarray(out["pred"])[m], dep[m])

    def test_always_clip(self):
        out, _ = _run(Config(prop_time=2, always_clip=True, prop_impl="xla"))
        for p in out["pred_inter"]:
            assert float(jnp.min(p)) >= 0.0

    def test_prop_time_one(self):
        out, _ = _run(Config(prop_time=1, prop_impl="xla"))
        assert len(out["pred_inter"]) == 1

    def test_prop_kernel_5(self):
        out, _ = _run(Config(prop_time=2, prop_kernel=5, use_GRU=False,
                             prop_impl="xla"))
        assert out["aff"].shape == (1, 32, 48, 25)


class TestTrainMode:
    def test_batch_stats_update(self):
        cfg = Config(prop_time=2, prop_impl="xla").finalize()
        model = get_model(cfg)
        s = _sample(b=2)
        variables = model.init(jax.random.PRNGKey(0), s, train=False)
        _, mutated = model.apply(variables, s, train=True,
                                 mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(before, after))

    def test_grads_nonzero(self):
        # zero_init_aff=False: with the zero-init head, aff_raw == 0 and
        # d(tanh(aff)/gamma)/d gamma == 0 exactly, so gamma gets no gradient
        # at init (true in the reference too).
        cfg = Config(prop_time=2, prop_impl="xla",
                     zero_init_aff=False).finalize()
        model = get_model(cfg)
        s = _sample(b=1)
        variables = model.init(jax.random.PRNGKey(0), s, train=False)
        gt = s["dep"] + 0.5

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                s, train=True, mutable=["batch_stats"])
            return jnp.mean((out["pred"] - gt) ** 2)

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree.leaves(grads)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
        assert total > 0
        # TGASS gamma is learnable -> must receive gradient
        g_gamma = grads["aff_scale_const"]
        assert float(jnp.abs(g_gamma[0])) > 0


class TestLoopKernelPath:
    """Constant-affinity whole-loop Pallas path (need_inter=False)."""

    def test_matches_unrolled_xla(self):
        s = _sample(b=2)
        cfg_x = Config(prop_time=4, use_GRU=False, prop_impl="xla").finalize()
        cfg_p = Config(prop_time=4, use_GRU=False,
                       prop_impl="pallas").finalize()
        model_x = get_model(cfg_x)
        variables = model_x.init(jax.random.PRNGKey(0), s, train=False)
        out_x = model_x.apply(variables, s, train=False)
        model_p = get_model(cfg_p)
        assert model_p._use_loop_kernel(False, False, 32, 48)
        out_p = model_p.apply(variables, s, train=False, need_inter=False)
        np.testing.assert_allclose(out_p["pred"], out_x["pred"],
                                   rtol=1e-4, atol=1e-5)
        # need_inter=False contract: per-iteration preds are NOT collected
        # on the loop-kernel fast path — empty, never a mislabeled stand-in
        assert out_p["pred_inter"] == []

    def test_train_grads_match_xla(self):
        s = _sample(b=1)
        gt = s["dep"] + 0.5
        cfg_x = Config(prop_time=3, use_GRU=False, prop_impl="xla",
                       zero_init_aff=False).finalize()
        cfg_p = cfg_x.replace(prop_impl="pallas")
        model_x, model_p = get_model(cfg_x), get_model(cfg_p)
        variables = model_x.init(jax.random.PRNGKey(0), s, train=False)

        def loss_fn(model, need_inter):
            def f(params):
                out, _ = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    s, train=True, need_inter=need_inter,
                    mutable=["batch_stats"])
                return jnp.mean((out["pred"] - gt) ** 2)
            return f

        g_x = jax.grad(loss_fn(model_x, True))(variables["params"])
        g_p = jax.grad(loss_fn(model_p, False))(variables["params"])
        for (kx, a), (kp, b) in zip(
                sorted((jax.tree_util.keystr(k), v) for k, v in
                       jax.tree_util.tree_leaves_with_path(g_x)),
                sorted((jax.tree_util.keystr(k), v) for k, v in
                       jax.tree_util.tree_leaves_with_path(g_p))):
            assert kx == kp
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5,
                                       err_msg=kx)

    def test_auto_never_routes_loop_kernel_in_model(self):
        """r03: 'auto' NEVER picks the whole-loop kernel inside the model
        — its custom-call layout pin degrades the surrounding convs more
        than the loop saves (measured 0.57-0.60x net at NYU/KITTI b=1;
        docs/PERFORMANCE.md). Only prop_impl='pallas' forces it."""
        cfg = Config(prop_time=4, use_GRU=False, prop_impl="auto").finalize()
        model = get_model(cfg)
        for b, h, w in [(1, 240, 1216), (2, 240, 1216), (1, 228, 304),
                        (1, 120, 160)]:
            assert model._use_loop_kernel(False, False, h, w) is False
            assert model._use_loop_kernel(False, True, h, w) is False
        # forced 'pallas' still routes (interpret-mode off-TPU)
        forced = get_model(cfg.replace(prop_impl="pallas"))
        assert forced._use_loop_kernel(False, False, 240, 1216)
