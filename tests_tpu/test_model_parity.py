"""On-device full-model forward parity vs the torch reference (VERDICT r3
weak item 1 / next item 3).

The CPU suite already pins forward/grad/trajectory parity against the real
reference implementation (tests/test_reference_parity.py), but the chip is
where layout/Mosaic surprises live (round 3's layout-pin finding). Here the
torch reference runs on the HOST CPU (stubbed DCN + torchvision structure,
same harness) and OUR model runs on the REAL TPU with the imported weights:

  * f32 forward parity for three configs — fork default (GRU+S2D+conf),
    --offset (non-local windowed gather), no-GRU constant-affinity
  * a pinned bf16-vs-f32 drift bound at the fork default
  * an on-device --offset TRAIN-step smoke (the r03 compile-pathology
    config: clamped windowed gather, scan loop) incl. offset telemetry

Reference call stack mirrored: /root/reference/src/model/nlspnmodel.py:
271-383 forward; torch goldens generated live from the checked-out
reference, so no binary fixtures ride in the repo. Skips when torch or the
reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

import test_reference_parity as trp  # noqa: E402  (shared harness)


def _golden(kw, h=64, w=96, bsz=2, seed=5):
    """Build the torch reference (host CPU), run forward, and return
    (sample, torch pred NHWC, our variables imported from its weights)."""
    import jax

    from nlspn_eccv20_tpu.models import get_model
    from nlspn_eccv20_tpu.utils.torch_import import import_nlspn_state_dict

    a = trp._args(patch_height=h, patch_width=w, **kw)
    tm = trp._ref_model(a)
    rng = np.random.default_rng(seed)
    rgb = rng.standard_normal((bsz, h, w, 3)).astype(np.float32)
    gt = np.clip(rng.random((bsz, h, w, 1)) * 8.0, 0.05, None).astype(np.float32)
    dep = (gt * (rng.random((bsz, h, w, 1)) > 0.95)).astype(np.float32)

    with torch.no_grad():
        t_out = tm({
            "rgb": torch.from_numpy(np.transpose(rgb, (0, 3, 1, 2))),
            "dep": torch.from_numpy(np.transpose(dep, (0, 3, 1, 2))),
        })
    t_pred = np.transpose(t_out["pred"].numpy(), (0, 2, 3, 1))

    cfg = trp._our_cfg(a)
    model = get_model(cfg)
    sample = {"rgb": rgb, "dep": dep, "gt": gt}
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    variables = import_nlspn_state_dict(variables, tm.state_dict(), cfg)
    return cfg, sample, t_pred, variables


@pytest.mark.parametrize("kw,tol", [
    # Measured-drift bounds vs the torch-CPU golden on a ~8 m depth
    # scale (r04 on the v5e: fork default 1.61e-3, offset 1.6e-3-class,
    # no-GRU 1.09e-2). The CPU suite already pins SEMANTIC equivalence
    # to 2e-4 (tests/test_reference_parity.py); what the chip adds is
    # device numerics — multi-pass-bf16 MXU f32 matmuls, TPU
    # transcendental approximations (tanh in TGASS, sigmoid in the
    # confidence head), and accumulation order — so these bounds pin
    # "bounded, stable device drift", ~2x over the worst measured value.
    ({}, 5e-3),                         # fork default: GRU+S2D+conf+preserve
    ({"offset": True, "prop_time": 4}, 5e-3),   # non-local windowed gather
    ({"use_GRU": False, "use_S2D": False}, 2e-2),
])
def test_forward_parity_on_device_f32(kw, tol):
    import jax

    from nlspn_eccv20_tpu.models import get_model

    cfg, sample, t_pred, variables = _golden(kw)
    model = get_model(cfg)
    fwd = jax.jit(lambda v, s: model.apply(v, s, train=False)["pred"])
    pred = np.asarray(jax.device_get(fwd(variables, sample)))
    err = np.max(np.abs(pred - t_pred))
    assert err < tol, f"on-device f32 parity: max|diff| = {err:.2e}"


def test_forward_parity_highest_precision_tightens_drift():
    """HIGHEST matmul precision must tighten the fork-default drift vs
    the torch golden (measured r04: 1.61e-3 default -> 1.20e-3 highest;
    the residual is transcendental + accumulation-order numerics the
    matmul precision flag cannot remove, bounded here at 2.5e-3)."""
    import jax

    from nlspn_eccv20_tpu.models import get_model

    cfg, sample, t_pred, variables = _golden({})
    model = get_model(cfg)
    fwd_d = jax.jit(lambda v, s: model.apply(v, s, train=False)["pred"])
    err_default = float(np.max(np.abs(
        np.asarray(jax.device_get(fwd_d(variables, sample))) - t_pred)))
    with jax.default_matmul_precision("highest"):
        fwd_h = jax.jit(lambda v, s: model.apply(v, s, train=False)["pred"])
        err_high = float(np.max(np.abs(
            np.asarray(jax.device_get(fwd_h(variables, sample))) - t_pred)))
    assert err_high < 2.5e-3, f"HIGHEST-precision drift {err_high:.2e}"
    assert err_high <= err_default * 1.05, (err_high, err_default)


def test_bf16_drift_bound_fork_default():
    """bf16 compute (fp32 params) must stay within a pinned drift of the
    f32 forward at the fork default — the precision the serving path
    advertises (--precision bf16). Bound = measured r04 drift x ~4 margin;
    a regression past it means a kernel stopped accumulating in f32."""
    import jax

    from nlspn_eccv20_tpu.models import get_model

    cfg, sample, _t_pred, variables = _golden({})
    model32 = get_model(cfg)
    model16 = get_model(cfg.replace(precision="bf16"))
    f32 = jax.jit(lambda v, s: model32.apply(v, s, train=False)["pred"])
    f16 = jax.jit(lambda v, s: model16.apply(v, s, train=False)["pred"])
    p32 = np.asarray(jax.device_get(f32(variables, sample)))
    p16 = np.asarray(jax.device_get(f16(variables, sample))).astype(np.float32)
    # relative RMS drift over the depth map (depth scale ~ max_depth)
    drift = float(np.sqrt(np.mean((p32 - p16) ** 2)) /
                  max(float(np.sqrt(np.mean(p32 ** 2))), 1e-6))
    assert drift < 5e-2, f"bf16 rel-RMS drift {drift:.3e} exceeds bound"
    # and bf16 still tracks the torch golden loosely
    assert np.max(np.abs(p16 - _t_pred)) < 0.5


@pytest.mark.parametrize("impl", ["xla", "auto"])
def test_offset_train_step_smoke_on_device(impl):
    """One real --offset train step on the chip, both routings: 'xla' is
    the r03 compile-pathology config (training clamps offsets into the
    window; the scan prop loop is force-routed for the XLA offset path —
    models/nlspn.py `loop_impl` — so this entry exercises the scan
    codegen); 'auto' resolves to the r05 Pallas kernel pair under the
    unrolled loop (models/nlspn._offset_uses_pallas), the production
    route. Pins: compiles, runs, finite loss/grads, telemetry present."""
    import jax

    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.train import Engine

    cfg = Config(data_name="Synthetic", patch_height=64, patch_width=96,
                 batch_size=2, prop_time=4, offset=True, prop_impl=impl,
                 num_threads=2).finalize()
    eng = Engine(cfg, steps_per_epoch=10)
    state = eng.init_state((64, 96))
    rng = np.random.default_rng(0)
    gt = np.clip(rng.random((2, 64, 96, 1)) * 8, 0.1, None).astype(np.float32)
    batch = {
        "rgb": rng.standard_normal((2, 64, 96, 3)).astype(np.float32),
        "dep": (gt * (rng.random((2, 64, 96, 1)) > 0.95)).astype(np.float32),
        "gt": gt,
    }
    step = eng.train_step_fn()
    # snapshot BEFORE the step: the jitted step donates the state
    # (donate_argnums=0), so `state`'s buffers are dead afterwards
    leaf0 = np.asarray(jax.device_get(
        state.params["conv1_rgb"]["conv"]["kernel"]))
    state2, aux = step(state, eng.put_train_batch(batch))
    loss = float(np.asarray(jax.device_get(aux["loss"])))
    assert np.isfinite(loss)
    assert "off_max" in aux
    off_max = float(np.asarray(jax.device_get(aux["off_max"])))
    assert np.isfinite(off_max) and off_max < cfg.offset_window
    # params actually moved
    leaf = np.asarray(jax.device_get(
        state2.params["conv1_rgb"]["conv"]["kernel"]))
    assert not np.array_equal(leaf, leaf0)


def test_offset_model_pallas_vs_xla_on_device():
    """Full-model --offset forward+gradient parity between the two
    deformable-gather routings ON THE CHIP: prop_impl='xla' (windowed
    slices, scan loop) vs 'auto'->pallas (ops/pallas/deform_prop.py,
    unrolled loop). Same params, same batch; predictions must agree to
    f32 accumulation-order tolerance and the train-step losses/grad
    norms must match — this is the guard that the r05 routing change
    cannot silently alter training semantics."""
    import jax
    import jax.numpy as jnp

    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.train import Engine

    rng = np.random.default_rng(5)
    h, w, b = 64, 96, 2
    gt = np.clip(rng.random((b, h, w, 1)) * 8, 0.1, None).astype(np.float32)
    batch = {
        "rgb": rng.standard_normal((b, h, w, 3)).astype(np.float32),
        "dep": (gt * (rng.random((b, h, w, 1)) > 0.95)).astype(np.float32),
        "gt": gt,
    }

    losses, preds = {}, {}
    for impl in ("xla", "auto"):
        cfg = Config(data_name="Synthetic", patch_height=h, patch_width=w,
                     batch_size=b, prop_time=4, offset=True,
                     prop_impl=impl, num_threads=2).finalize()
        eng = Engine(cfg, steps_per_epoch=10)
        state = eng.init_state((h, w))  # same seed -> identical init
        state2, aux = eng.train_step_fn()(state, eng.put_train_batch(batch))
        losses[impl] = float(np.asarray(jax.device_get(aux["loss"])))
        preds[impl] = np.asarray(jax.device_get(aux["output"]["pred"]))
        jax.block_until_ready(state2.params)

    assert np.isfinite(losses["xla"]) and np.isfinite(losses["auto"])
    np.testing.assert_allclose(losses["auto"], losses["xla"], rtol=1e-4)
    scale = max(np.max(np.abs(preds["xla"])), 1.0)
    assert np.max(np.abs(preds["auto"] - preds["xla"])) / scale < 1e-3


def test_kitti_shape_forward_on_device():
    """KITTI-shaped (240x1216 fork-default) forward outside bench: pins
    that the serving shape compiles and produces in-range depth."""
    import jax
    import jax.numpy as jnp

    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.models import get_model

    cfg = Config(patch_height=240, patch_width=1216, batch_size=1,
                 max_depth=90.0, num_sample=0).finalize()
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    sample = {
        "rgb": jnp.asarray(rng.standard_normal((1, 240, 1216, 3)),
                           jnp.float32),
        "dep": jnp.asarray((rng.random((1, 240, 1216, 1)) > 0.98) * 20,
                           jnp.float32),
    }
    variables = jax.jit(lambda k, s: model.init(k, s, train=False))(
        jax.random.PRNGKey(0), sample)
    pred = np.asarray(jax.device_get(jax.jit(
        lambda v, s: model.apply(v, s, train=False)["pred"])(
            variables, sample)))
    assert pred.shape == (1, 240, 1216, 1)
    assert np.isfinite(pred).all() and pred.min() >= 0.0
