"""CLI smoke tests on the synthetic dataset (end-to-end drivers)."""

import json
import os

import pytest


def test_main_random_rl_synthetic(tmp_path):
    from salun.cli.main_random import main

    results = main([
        "--dataset", "synthetic", "--arch", "resnet20s",
        "--unlearn", "RL", "--unlearn_lr", "0.01", "--unlearn_epochs", "1",
        "--batch_size", "64", "--decreasing_lr", "2",
        "--class_to_replace", "0",
        "--save_dir", str(tmp_path),
    ])
    assert "UA" in results and "SVC_MIA_forget_efficacy" in results
    assert os.path.exists(tmp_path / "RL_eval_result.json")
    loaded = json.load(open(tmp_path / "RL_eval_result.json"))
    assert "retain" in loaded


def test_generate_mask_cli_synthetic(tmp_path):
    from salun.cli.generate_mask import main

    main([
        "--dataset", "synthetic", "--arch", "resnet20s",
        "--batch_size", "64", "--class_to_replace", "0",
        "--save_dir", str(tmp_path),
    ])
    # ten thresholds saved
    found = [p for p in os.listdir(tmp_path) if p.startswith("with_")]
    assert len(found) == 10, found
