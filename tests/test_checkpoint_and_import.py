"""Checkpoint save/restore roundtrip + torchvision weight import tests."""

import os

import jax
import numpy as np
import pytest

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.train import Engine
from nlspn_eccv20_tpu.utils.checkpoint import CheckpointManager


def _cfg(tmp_path, **kw):
    return Config(data_name="Synthetic", patch_height=16, patch_width=24,
                  prop_time=2, batch_size=2, prop_impl="xla",
                  save_dir=str(tmp_path / "run"), **kw).finalize()


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = _cfg(tmp_path)
        eng = Engine(cfg, steps_per_epoch=1)
        state = eng.init_state((16, 24))
        tree = jax.device_get({"params": state.params,
                               "batch_stats": state.batch_stats,
                               "opt_state": state.opt_state,
                               "step": state.step})
        mgr = CheckpointManager(cfg)
        mgr.save(3, tree)
        assert mgr.latest_epoch() == 3
        restored = mgr.restore(template=tree)
        a = jax.tree.leaves(tree["params"])
        b = jax.tree.leaves(restored["params"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        assert os.path.exists(os.path.join(cfg.save_dir, "args.json"))
        mgr.close()

    def test_keep_last_only(self, tmp_path):
        cfg = _cfg(tmp_path)
        eng = Engine(cfg, steps_per_epoch=1)
        state = eng.init_state((16, 24))
        tree = jax.device_get({"params": state.params, "step": state.step})
        mgr = CheckpointManager(cfg)
        mgr.save(1, tree)
        mgr.save(2, tree)
        # reference deletes the previous epoch file (main.py:277-280)
        assert mgr.latest_epoch() == 2
        assert mgr._mgr.all_steps() == [2]
        mgr.close()


    def test_save_full_false_strips_opt_state(self, tmp_path):
        # reference --no_save_full saves {net, args} only on non-final
        # epochs (main.py:263-275); resume then restores weights and keeps
        # a fresh optimizer (main.py:140-149).
        cfg = _cfg(tmp_path)
        eng = Engine(cfg, steps_per_epoch=1)
        state = eng.init_state((16, 24))
        tree = jax.device_get({"params": state.params,
                               "batch_stats": state.batch_stats,
                               "opt_state": state.opt_state,
                               "step": state.step,
                               "steps_per_epoch": np.asarray(5, np.int32)})
        mgr = CheckpointManager(cfg)
        mgr.save(1, tree, full=False)
        # steps_per_epoch rides along in weights-only saves so the
        # resume-time LR-shift guard fires for --no_save_full too
        # (ADVICE r4; utils/checkpoint.WEIGHT_KEYS).
        assert set(mgr._mgr.item_metadata(1).keys()) == {
            "params", "batch_stats", "steps_per_epoch"}
        # restore with a FULL template silently drops the absent keys
        restored = mgr.restore(1, template=tree)
        assert set(restored) == {"params", "batch_stats", "steps_per_epoch"}
        assert int(restored["steps_per_epoch"]) == 5
        for x, y in zip(jax.tree.leaves(tree["params"]),
                        jax.tree.leaves(restored["params"])):
            np.testing.assert_array_equal(x, y)
        # full save still keeps everything (last epoch always saves full)
        mgr.save(2, tree, full=True)
        assert "opt_state" in set(mgr._mgr.item_metadata(2).keys())
        mgr.close()

    def test_config_reload(self, tmp_path):
        cfg = _cfg(tmp_path, max_depth=42.0)
        CheckpointManager(cfg).save(1, {"x": np.zeros(3)})
        cfg2 = CheckpointManager.load_config(cfg.save_dir)
        assert cfg2.max_depth == 42.0

    def test_check_args_resume_reloads_saved_config(self, tmp_path):
        # reference main.py:57-77: --resume replaces the whole args namespace
        # from the checkpoint dir, keeping test_only/pretrain/dir_data/resume
        from nlspn_eccv20_tpu.config import check_args

        cfg = _cfg(tmp_path, max_depth=42.0, lr=0.005)
        CheckpointManager(cfg).save(1, {"x": np.zeros(3)})

        cli = Config(resume=True, pretrain=cfg.save_dir, dir_data="/elsewhere",
                     max_depth=10.0, lr=0.001).finalize()
        merged = check_args(cli)
        assert merged.max_depth == 42.0 and merged.lr == 0.005  # from saved
        assert merged.dir_data == "/elsewhere" and merged.resume  # from CLI
        assert merged.save_dir == cfg.save_dir  # continue in same experiment

    def test_check_args_resume_requires_pretrain(self):
        from nlspn_eccv20_tpu.config import check_args

        with pytest.raises(ValueError):
            check_args(Config(resume=True).finalize())


class TestConfigValidation:
    # The reference fails lazily at forward time (nlspnmodel.py:29-30,199);
    # Config rejects bad values at construction instead.
    @pytest.mark.parametrize("bad", [
        dict(prop_kernel=4), dict(prop_kernel=-3),
        dict(affinity="BOGUS"),
        dict(prop_time=-1),
        dict(num_sample=-5),
        dict(batch_size=0),
        dict(optimizer="LION"),
        dict(network="resnet50"),
        dict(precision="fp16"),
        dict(prop_impl="cuda"),
        dict(prop_loop="while"),
    ])
    def test_bad_values_rejected_at_construction(self, bad):
        with pytest.raises(ValueError):
            Config(**bad)

    def test_replace_revalidates(self):
        cfg = Config()
        with pytest.raises(ValueError):
            cfg.replace(affinity="BOGUS")


class TestTorchImport:
    def test_resnet18_roundtrip(self, tmp_path):
        torch = pytest.importorskip("torch")

        # synthesize a torchvision-layout resnet18 state_dict (torchvision
        # itself is not installed in this image)
        def bn(pre, c, sd):
            sd[pre + ".weight"] = torch.randn(c)
            sd[pre + ".bias"] = torch.randn(c)
            sd[pre + ".running_mean"] = torch.randn(c)
            sd[pre + ".running_var"] = torch.rand(c) + 0.5

        sd = {}
        specs = [("layer1", 64, 64, 2, False), ("layer2", 64, 128, 2, True),
                 ("layer3", 128, 256, 2, True)]
        for layer, cin, cout, blocks, down in specs:
            for b in range(blocks):
                ci = cin if b == 0 else cout
                pre = f"{layer}.{b}"
                sd[pre + ".conv1.weight"] = torch.randn(cout, ci, 3, 3)
                bn(pre + ".bn1", cout, sd)
                sd[pre + ".conv2.weight"] = torch.randn(cout, cout, 3, 3)
                bn(pre + ".bn2", cout, sd)
                if b == 0 and down:
                    sd[pre + ".downsample.0.weight"] = torch.randn(cout, ci, 1, 1)
                    bn(pre + ".downsample.1", cout, sd)
        path = str(tmp_path / "resnet18.pth")
        torch.save(sd, path)
        state_ref = sd

        from nlspn_eccv20_tpu.models import get_model
        from nlspn_eccv20_tpu.utils.torch_import import apply_resnet_pretrained

        cfg = Config(patch_height=16, patch_width=24, prop_time=1,
                     use_GRU=False, prop_impl="xla").finalize()
        model = get_model(cfg)
        import jax.numpy as jnp
        sample = {"rgb": jnp.zeros((1, 16, 24, 3)),
                  "dep": jnp.zeros((1, 16, 24, 1))}
        variables = model.init(jax.random.PRNGKey(0), sample, train=False)
        v2 = apply_resnet_pretrained(dict(variables), path, "resnet18")

        # imported conv kernel matches the torch tensor transposed
        w_torch = state_ref["layer1.0.conv1.weight"].numpy()
        w_ours = np.asarray(v2["params"]["conv2"]["block0"]["conv1"]["kernel"])
        np.testing.assert_allclose(w_ours, np.transpose(w_torch, (2, 3, 1, 0)))

        # model still runs with imported weights
        out = model.apply({"params": v2["params"],
                           "batch_stats": v2["batch_stats"]},
                          sample, train=False)
        assert np.isfinite(np.asarray(out["pred"])).all()


def _make_resnet18_sd(torch, seed=0):
    """Synthesize a torchvision-layout resnet18 layer1-3 state_dict
    (torchvision itself is not installed in this image)."""
    g = torch.Generator().manual_seed(seed)

    def bn(pre, c, sd):
        sd[pre + ".weight"] = torch.randn(c, generator=g) * 0.1 + 1.0
        sd[pre + ".bias"] = torch.randn(c, generator=g) * 0.1
        sd[pre + ".running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[pre + ".running_var"] = torch.rand(c, generator=g) + 0.5

    sd = {}
    specs = [("layer1", 64, 64, 2, False), ("layer2", 64, 128, 2, True),
             ("layer3", 128, 256, 2, True)]
    for layer, cin, cout, blocks, down in specs:
        for b in range(blocks):
            ci = cin if b == 0 else cout
            pre = f"{layer}.{b}"
            sd[pre + ".conv1.weight"] = torch.randn(cout, ci, 3, 3, generator=g) * 0.05
            bn(pre + ".bn1", cout, sd)
            sd[pre + ".conv2.weight"] = torch.randn(cout, cout, 3, 3, generator=g) * 0.05
            bn(pre + ".bn2", cout, sd)
            if b == 0 and down:
                sd[pre + ".downsample.0.weight"] = torch.randn(cout, ci, 1, 1, generator=g) * 0.05
                bn(pre + ".downsample.1", cout, sd)
    return sd


def _torch_layer1_eval(torch, sd, x):
    """Eval-mode forward of torchvision layer1 (2 BasicBlocks, no
    downsample) straight from the state_dict tensors."""
    import torch.nn.functional as F

    for b in range(2):
        pre = f"layer1.{b}."
        idt = x
        y = F.conv2d(x, sd[pre + "conv1.weight"], padding=1)
        y = F.batch_norm(y, sd[pre + "bn1.running_mean"],
                         sd[pre + "bn1.running_var"], sd[pre + "bn1.weight"],
                         sd[pre + "bn1.bias"], training=False)
        y = F.relu(y)
        y = F.conv2d(y, sd[pre + "conv2.weight"], padding=1)
        y = F.batch_norm(y, sd[pre + "bn2.running_mean"],
                         sd[pre + "bn2.running_var"], sd[pre + "bn2.weight"],
                         sd[pre + "bn2.bias"], training=False)
        x = F.relu(y + idt)
    return x


class TestBackbonePretrainWiring:
    """init_backbone_pretrained is the train-path hook (main.train calls it
    right after Engine.init_state); the reference equivalent is pretrained
    loading at model construction (common.py:21-42 gated by --from_scratch,
    config.py:216-220)."""

    def _cfg(self, **kw):
        return Config(data_name="Synthetic", patch_height=16, patch_width=24,
                      batch_size=2, prop_time=1, use_GRU=False,
                      prop_impl="xla", compile_cache=False, **kw).finalize()

    def test_wired_path_applies_and_matches_torch_stage(self, tmp_path):
        torch = pytest.importorskip("torch")
        from nlspn_eccv20_tpu.train import init_backbone_pretrained

        sd = _make_resnet18_sd(torch)
        torch.save(sd, str(tmp_path / "resnet18.pth"))

        cfg = self._cfg(dir_pretrain_backbone=str(tmp_path))
        engine = Engine(cfg)
        state = engine.init_state((16, 24))
        before = np.asarray(jax.device_get(
            state.params["conv2"]["block0"]["conv1"]["kernel"]))
        state = init_backbone_pretrained(cfg, state)

        w = np.asarray(jax.device_get(
            state.params["conv2"]["block0"]["conv1"]["kernel"]))
        ref = np.transpose(sd["layer1.0.conv1.weight"].numpy(), (2, 3, 1, 0))
        np.testing.assert_allclose(w, ref, atol=0)
        assert not np.allclose(w, before)
        # batch_stats imported too
        m = np.asarray(jax.device_get(
            state.batch_stats["conv2"]["block0"]["bn1"]["BatchNorm_0"]["mean"]))
        np.testing.assert_allclose(m, sd["layer1.0.bn1.running_mean"].numpy())

        # stage-output parity: our conv2 stage (eval mode, imported weights)
        # reproduces torch layer1 on the same input
        x = np.random.RandomState(1).randn(1, 8, 12, 64).astype(np.float32)
        from nlspn_eccv20_tpu.models.resnet import ResNetStage
        stage = ResNetStage(64, 2, stride=1)
        ours = stage.apply(
            {"params": jax.device_get(state.params["conv2"]),
             "batch_stats": jax.device_get(state.batch_stats["conv2"])},
            x, train=False)
        theirs = _torch_layer1_eval(
            torch, sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
            atol=2e-5, rtol=1e-5)

    def test_from_scratch_gates(self, tmp_path):
        torch = pytest.importorskip("torch")
        from nlspn_eccv20_tpu.train import init_backbone_pretrained

        torch.save(_make_resnet18_sd(torch), str(tmp_path / "resnet18.pth"))
        cfg = self._cfg(dir_pretrain_backbone=str(tmp_path), from_scratch=True)
        engine = Engine(cfg)
        state = engine.init_state((16, 24))
        before = np.asarray(jax.device_get(
            state.params["conv2"]["block0"]["conv1"]["kernel"]))
        state2 = init_backbone_pretrained(cfg, state)
        after = np.asarray(jax.device_get(
            state2.params["conv2"]["block0"]["conv1"]["kernel"]))
        np.testing.assert_array_equal(before, after)

    def test_missing_default_warns_missing_explicit_raises(self, tmp_path):
        from nlspn_eccv20_tpu.train import init_backbone_pretrained

        cfg = self._cfg()  # default dir 'pretrained' (absent here)
        engine = Engine(cfg)
        state = engine.init_state((16, 24))
        with pytest.warns(UserWarning, match="FROM SCRATCH"):
            init_backbone_pretrained(cfg, state)

        cfg2 = self._cfg(dir_pretrain_backbone=str(tmp_path / "nope"))
        with pytest.raises(FileNotFoundError):
            init_backbone_pretrained(cfg2, state)
