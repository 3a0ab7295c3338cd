"""Tests for the real-data readiness preflight (nlspn_eccv20_tpu.preflight).

Each failure mode the preflight guards (missing/bad split JSON, absent data
files, missing backbone, bad --pretrain, unwritable save_dir) is staged on
a tmp tree and must be reported at the right severity — the point is that
a data-equipped rig learns about a broken run BEFORE burning a TPU
allocation (VERDICT r4 missing 1; recipes /root/reference/README.md:205-294).
"""

import json
import os

import numpy as np
import pytest

from nlspn_eccv20_tpu.config import Config
from nlspn_eccv20_tpu.preflight import (
    FAIL,
    OK,
    WARN,
    main as preflight_main,
    run_preflight,
)


def _status(report, name):
    for c in report.checks:
        if c.name == name:
            return c.status
    raise AssertionError(f"no check named {name}: {report.checks}")


def _nyu_tree(tmp_path, n=3, split="train"):
    """A minimal on-disk NYU layout + split json; returns (dir_data, json)."""
    dd = tmp_path / "nyu"
    entries = []
    for i in range(n):
        rel = f"{split}/scene_{i:04d}/{i:05d}.h5"
        p = dd / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")
        entries.append({"filename": rel})
    sj = tmp_path / "split.json"
    sj.write_text(json.dumps({"train": entries, "val": entries,
                              "test": entries}))
    return str(dd), str(sj)


def _cfg(tmp_path, **kw):
    base = dict(data_name="NYU", from_scratch=True,
                save_dir=str(tmp_path / "exp" / "run"))
    base.update(kw)
    return Config(**base).finalize()


class TestSplitJson:
    def test_missing_json_fails(self, tmp_path):
        cfg = _cfg(tmp_path, split_json=str(tmp_path / "nope.json"))
        r = run_preflight(cfg)
        assert _status(r, "split_json") == FAIL

    def test_invalid_json_fails(self, tmp_path):
        bad = tmp_path / "bad.json"
        bad.write_text("{not json")
        cfg = _cfg(tmp_path, split_json=str(bad))
        assert _status(run_preflight(cfg), "split_json") == FAIL

    def test_missing_split_fails_and_hints_test_only(self, tmp_path):
        sj = tmp_path / "t.json"
        sj.write_text(json.dumps({"test": [{"filename": "a.h5"}]}))
        cfg = _cfg(tmp_path, split_json=str(sj))
        r = run_preflight(cfg)
        assert _status(r, "split_json") == FAIL
        detail = [c for c in r.checks if c.name == "split_json"][0].detail
        assert "--test_only" in detail
        # ... and with --test_only the same JSON is fine
        cfg2 = _cfg(tmp_path, split_json=str(sj), test_only=True,
                    dir_data=str(tmp_path))
        r2 = run_preflight(cfg2)
        assert _status(r2, "split_json") == OK

    def test_wrong_schema_fails(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        # KITTIDC schema expected but NYU-style entries given
        cfg = _cfg(tmp_path, data_name="KITTIDC", dir_data=dd,
                   split_json=sj)
        assert _status(run_preflight(cfg), "split_json") == FAIL

    def test_vendored_default_resolves(self, tmp_path):
        # the vendored data_json/nyu.json must resolve from any cwd
        cfg = _cfg(tmp_path, split_json="data_json/nyu.json",
                   dir_data=str(tmp_path / "absent"))
        r = run_preflight(cfg)
        assert _status(r, "split_json") == OK
        assert _status(r, "dir_data") == FAIL  # data itself absent here


class TestDataTree:
    def test_all_present_ok(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj)
        r = run_preflight(cfg)
        assert _status(r, "dir_data") == OK
        for s in ("train", "val", "test"):
            assert _status(r, f"data[{s}]") == OK

    def test_missing_file_fails_with_example(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        os.remove(os.path.join(dd, "train/scene_0000/00000.h5"))
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj)
        r = run_preflight(cfg)
        assert _status(r, "data[train]") == FAIL
        detail = [c for c in r.checks if c.name == "data[train]"][0].detail
        assert "scene_0000" in detail

    def test_deep_scan_catches_mid_list_hole(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path, n=9)
        # a hole the first/middle/last sampling misses
        os.remove(os.path.join(dd, "train/scene_0001/00001.h5"))
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj)
        assert _status(run_preflight(cfg), "data[train]") == OK  # sampled
        assert _status(run_preflight(cfg, deep=True),
                       "data[train]") == FAIL

    def test_synthetic_needs_no_files(self, tmp_path):
        cfg = Config(data_name="Synthetic",
                     save_dir=str(tmp_path / "run")).finalize()
        r = run_preflight(cfg)
        assert _status(r, "dir_data") == OK


class TestBackbone:
    def test_default_dir_missing_warns(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj,
                   from_scratch=False)
        assert _status(run_preflight(cfg), "backbone") == WARN

    def test_explicit_dir_missing_fails(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj,
                   from_scratch=False,
                   dir_pretrain_backbone=str(tmp_path / "bb"))
        assert _status(run_preflight(cfg), "backbone") == FAIL

    def test_present_ok(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        bb = tmp_path / "bb"
        bb.mkdir()
        (bb / "resnet18.pth").write_bytes(b"x")
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj,
                   from_scratch=False, dir_pretrain_backbone=str(bb))
        assert _status(run_preflight(cfg), "backbone") == OK

    def test_resume_with_checkpoint_skips(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        run = tmp_path / "resume_run"
        (run / "ckpt" / "3").mkdir(parents=True)
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj,
                   from_scratch=False, resume=True, save_dir=str(run),
                   dir_pretrain_backbone=str(tmp_path / "absent_bb"))
        assert _status(run_preflight(cfg), "backbone") == OK


class TestPretrainAndSaveDir:
    def test_missing_pretrain_fails(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj,
                   pretrain=str(tmp_path / "none.pt"))
        assert _status(run_preflight(cfg), "pretrain") == FAIL

    def test_pt_file_ok_and_empty_dir_fails(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        pt = tmp_path / "w.pt"
        pt.write_bytes(b"x")
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj, pretrain=str(pt))
        assert _status(run_preflight(cfg), "pretrain") == OK
        empty = tmp_path / "emptyrun"
        empty.mkdir()
        cfg2 = _cfg(tmp_path, dir_data=dd, split_json=sj,
                    pretrain=str(empty))
        assert _status(run_preflight(cfg2), "pretrain") == FAIL

    def test_test_only_without_pretrain_warns(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj, test_only=True)
        assert _status(run_preflight(cfg), "pretrain") == WARN

    def test_unwritable_save_dir_fails(self, tmp_path):
        dd, sj = _nyu_tree(tmp_path)
        ro = tmp_path / "ro"
        ro.mkdir()
        os.chmod(ro, 0o500)
        if os.access(str(ro), os.W_OK):  # running as root: chmod is moot
            pytest.skip("cannot create an unwritable dir as this user")
        cfg = _cfg(tmp_path, dir_data=dd, split_json=sj,
                   save_dir=str(ro / "run"))
        assert _status(run_preflight(cfg), "save_dir") == FAIL


class TestCLI:
    def test_cli_ready_and_not_ready_exit_codes(self, tmp_path, capsys):
        dd, sj = _nyu_tree(tmp_path)
        argv = ["--data_name", "NYU", "--dir_data", dd, "--split_json", sj,
                "--from_scratch", "--save_dir", str(tmp_path / "r"),
                "--save", "pf"]
        assert preflight_main(argv) == 0
        out = capsys.readouterr().out
        assert "READY" in out and "resolved recipe" in out

        argv_bad = list(argv)
        argv_bad[argv_bad.index(dd)] = str(tmp_path / "absent")
        assert preflight_main(argv_bad) == 1
        assert "NOT READY" in capsys.readouterr().out

    def test_cli_deep_flag(self, tmp_path, capsys):
        dd, sj = _nyu_tree(tmp_path, n=9)
        os.remove(os.path.join(dd, "train/scene_0001/00001.h5"))
        argv = ["--deep", "--data_name", "NYU", "--dir_data", dd,
                "--split_json", sj, "--from_scratch",
                "--save_dir", str(tmp_path / "r"), "--save", "pf"]
        assert preflight_main(argv) == 1
