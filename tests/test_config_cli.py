"""Config system + CLI tests (SURVEY.md R6, §5.6)."""

import json
import os

import numpy as np
import pytest

from colvo.config import ColvoConfig


def test_defaults_and_overrides():
    cfg = ColvoConfig()
    cfg.apply_overrides(["train.lr=2e-4", "model.n_scales=2", "loss.lcc=false",
                         "data.frame_offsets=[-1,1]"])
    assert cfg.train.lr == 2e-4
    assert cfg.model.n_scales == 2
    assert cfg.loss.lcc is False
    assert cfg.data.frame_offsets == (-1, 1)


def test_unknown_key_rejected():
    cfg = ColvoConfig()
    with pytest.raises(KeyError):
        cfg.apply_overrides(["train.nope=1"])
    with pytest.raises(KeyError):
        ColvoConfig.from_dict({"train": {"nope": 1}})


def test_dump_load_roundtrip(tmp_path):
    cfg = ColvoConfig()
    cfg.train.lr = 3.3e-4
    cfg.loss.lcc_mode = "gain"
    p = str(tmp_path / "cfg.json")
    cfg.dump(p)
    loaded = ColvoConfig.load(p)
    assert loaded.train.lr == 3.3e-4
    assert loaded.loss.lcc_mode == "gain"
    assert loaded.to_dict() == cfg.to_dict()


def test_cli_viz_roundtrip(tmp_path):
    from colvo.cli import main

    run_dir = str(tmp_path)
    poses = np.broadcast_to(np.eye(4), (10, 4, 4)).copy()
    poses[:, 2, 3] = np.arange(10) * 0.01
    np.save(os.path.join(run_dir, "trajectory.npy"), poses)
    assert main(["viz", run_dir]) == 0
    assert os.path.getsize(os.path.join(run_dir, "trajectory.png")) > 1000


def test_cli_requires_command():
    from colvo.cli import main

    with pytest.raises(SystemExit):
        main([])
