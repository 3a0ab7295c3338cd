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
