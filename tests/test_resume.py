"""Resume support (VERDICT r1 item #6).

Reference behavior being reproduced: main_train.py:85-98 resumes
{model, optimizer, scheduler, epoch, best_sa, curves};
main_random.py:122-126 resumes the unlearned model and skips the loop;
DDPM/runners/diffusion.py:213-218 resumes [model, optimizer, step, ema].

The TPU build goes further: a killed-and-resumed run produces the SAME
final parameters as a straight-through run (per-step keys are fold_in(seed,
global_step) and shuffle orders are pure functions of (seed, epoch))."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.quick


def _train_args(save_dir, epochs, resume=False):
    argv = [
        "--dataset", "synthetic", "--arch", "resnet20s",
        "--batch_size", "256", "--epochs", str(epochs),
        "--lr", "0.05", "--decreasing_lr", "2,3",
        "--save_dir", str(save_dir),
    ]
    if resume:
        argv.append("--resume")
    return argv


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_main_train_resume_matches_straight_run(tmp_path):
    from salun import ckpt
    from salun.cli.main_train import main

    straight = tmp_path / "straight"
    resumed = tmp_path / "resumed"

    main(_train_args(straight, epochs=2))

    main(_train_args(resumed, epochs=1))        # "killed" after epoch 1
    main(_train_args(resumed, epochs=2, resume=True))

    a = ckpt.restore(os.path.join(straight, "checkpoint"))
    b = ckpt.restore(os.path.join(resumed, "checkpoint"))
    assert int(np.asarray(a["epoch"])) == int(np.asarray(b["epoch"])) == 2
    for la, lb in zip(_leaves(a["state"]["params"]),
                      _leaves(b["state"]["params"])):
        np.testing.assert_array_equal(la, lb)
    for la, lb in zip(_leaves(a["state"]["opt_state"]),
                      _leaves(b["state"]["opt_state"])):
        np.testing.assert_array_equal(la, lb)
    # curves concatenate across the restart
    assert len(np.asarray(a["curves"]["val_acc"])) == 2
    np.testing.assert_allclose(np.asarray(a["curves"]["val_acc"]),
                               np.asarray(b["curves"]["val_acc"]))


def test_main_random_resume_skips_unlearning(tmp_path, monkeypatch):
    from salun.cli.main_random import main

    argv = [
        "--dataset", "synthetic", "--arch", "resnet20s",
        "--unlearn", "RL", "--unlearn_lr", "0.01", "--unlearn_epochs", "1",
        "--batch_size", "64", "--decreasing_lr", "2",
        "--class_to_replace", "0", "--save_dir", str(tmp_path),
    ]
    r1 = main(argv)
    assert os.path.exists(tmp_path / "RL_eval_result.json")

    # resume run must not dispatch the unlearn method again
    import salun.core.methods as methods

    def boom(name):
        raise AssertionError("unlearn method dispatched on resume")

    monkeypatch.setattr(methods, "get_unlearn_method", boom)
    monkeypatch.setattr("salun.cli.main_random.get_unlearn_method", boom)
    r2 = main(argv + ["--resume"])
    # same model → same accuracies
    for k in ("retain", "forget", "val", "test", "UA"):
        np.testing.assert_allclose(r1[k], r2[k], atol=1e-4)


def test_ddpm_resume_matches_straight_run(tmp_path):
    from salun import ckpt
    from salun.cli.ddpm_train import main
    from tests.test_ddpm_cli import TINY_YML

    cfg = tmp_path / "tiny.yml"
    cfg.write_text(TINY_YML)
    base = ["--config", str(cfg), "--mode", "train", "--seed", "7"]

    def run(save_dir, n_iters, resume=False):
        argv = base + ["--save_dir", str(save_dir),
                       "--n_iters", str(n_iters)]
        if resume:
            argv.append("--resume")
        main(argv)

    # straight: 6 iters; resumed: 3 iters, then continue to 6
    run(tmp_path / "straight", 6)
    run(tmp_path / "resumed", 3)
    run(tmp_path / "resumed", 6, resume=True)

    a = ckpt.restore(str(tmp_path / "straight" / "ckpt"))
    b = ckpt.restore(str(tmp_path / "resumed" / "ckpt"))
    assert int(np.asarray(a["step"])) == int(np.asarray(b["step"])) == 6
    for la, lb in zip(_leaves(a["params"]), _leaves(b["params"])):
        np.testing.assert_array_equal(la, lb)
    for la, lb in zip(_leaves(a["opt_state"]), _leaves(b["opt_state"])):
        np.testing.assert_array_equal(la, lb)
