"""DDPM CLI smoke tests on a tiny config + synthetic data."""

import os

import pytest

TINY_YML = """
data:
  dataset: synthetic
  image_size: 32
  channels: 3
  n_classes: 10
model:
  ch: 32
  out_ch: 3
  ch_mult: [1, 2]
  num_res_blocks: 1
  attn_resolutions: [16]
  dropout: 0.0
  cond_drop_prob: 0.1
  var_type: fixedlarge
  ema: false
diffusion:
  beta_schedule: linear
  beta_start: 0.0001
  beta_end: 0.02
  num_diffusion_timesteps: 20
training:
  n_iters: 2
  batch_size: 8
  snapshot_freq: 100
  log_freq: 1
  method: rl
optim:
  lr: 0.0001
  grad_clip: 1.0
sampling:
  cond_scale: 2.0
"""


@pytest.fixture
def tiny_config(tmp_path):
    p = tmp_path / "tiny.yml"
    p.write_text(TINY_YML)
    return str(p)


def test_ddpm_train_mode(tiny_config, tmp_path):
    from salun.cli.ddpm_train import main

    main(["--config", tiny_config, "--mode", "train",
          "--save_dir", str(tmp_path / "out")])
    assert os.path.exists(tmp_path / "out")


def test_ddpm_generate_mask_and_unlearn(tiny_config, tmp_path):
    from salun import ckpt
    from salun.cli.ddpm_train import main

    main(["--config", tiny_config, "--mode", "generate_mask",
          "--label_to_forget", "0", "--save_dir", str(tmp_path / "out")])
    mask_path = str(tmp_path / "out" / "mask" / "0" / "with_0.5")
    restored = ckpt.restore(mask_path)
    assert "mask" in restored

    main(["--config", tiny_config, "--mode", "saliency_unlearn",
          "--method", "rl", "--label_to_forget", "0",
          "--mask_path", mask_path, "--save_dir", str(tmp_path / "out2")])
    payload = ckpt.restore(str(tmp_path / "out2" / "ckpt"))
    assert "params" in payload


def test_ddpm_train_esd_raises(tiny_config, tmp_path):
    from salun.cli.ddpm_train import main

    with pytest.raises(NotImplementedError):
        main(["--config", tiny_config, "--mode", "train_esd",
              "--save_dir", str(tmp_path / "out")])


@pytest.mark.slow  # three chained CLI compiles (train → fim → SA-forget)
def test_ddpm_fim_then_train_forget_chain(tiny_config, tmp_path):
    """SA baseline chain (DDPM/fim.py → train.py --mode forget): train a
    ckpt, compute the Fisher dict with the fim driver, build a tiny
    class_samples tree, and run the EWC+remember forget mode end to end."""
    import numpy as np
    from PIL import Image

    from salun import ckpt
    from salun.cli.ddpm_fim import main as fim_main
    from salun.cli.ddpm_train import main as train_main

    base = tmp_path / "base"
    train_main(["--config", tiny_config, "--mode", "train",
                "--save_dir", str(base)])

    fim_main(["--config", tiny_config, "--ckpt_folder", str(base),
              "--save_dir", str(base), "--n_samples", "8", "--batch", "4",
              "--n_timestep_samples", "2"])
    fisher = ckpt.restore(str(base / "fisher"))
    assert "fim" in fisher

    rng = np.random.RandomState(0)
    for cls in range(10):
        d = base / "class_samples" / str(cls)
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(
                rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
                    d / f"{i}.png")

    out = tmp_path / "forget_out"
    train_main(["--config", tiny_config, "--mode", "forget",
                "--label_to_forget", "0", "--ckpt_folder", str(base),
                "--save_dir", str(out)])
    payload = ckpt.restore(str(out / "ckpt"))
    assert "params" in payload


@pytest.mark.slow
def test_ddpm_retrain_mode(tiny_config, tmp_path):
    """retrain drops the forgotten class and trains from fresh params
    (diffusion.py:399-480)."""
    from salun import ckpt
    from salun.cli.ddpm_train import main

    main(["--config", tiny_config, "--mode", "retrain",
          "--label_to_forget", "0", "--save_dir", str(tmp_path / "out")])
    payload = ckpt.restore(str(tmp_path / "out" / "ckpt"))
    assert "params" in payload


@pytest.mark.slow
def test_ddpm_sample_and_save_base_clis(tiny_config, tmp_path):
    """sample_classes on a trained tiny ckpt (x0 exclusion syntax) and the
    FID reference-set snapshot CLI, end to end on synthetic data."""
    from salun.cli.ddpm_sample import main as sample_main
    from salun.cli.ddpm_save_base import main as save_base_main
    from salun.cli.ddpm_train import main as train_main

    base = tmp_path / "base"
    train_main(["--config", tiny_config, "--mode", "train",
                "--save_dir", str(base)])
    out = tmp_path / "samples"
    sample_main(["--config", tiny_config, "--mode", "sample_classes",
                 "--ckpt_folder", str(base), "--save_dir", str(out),
                 "--n_samples_per_class", "2", "--batch", "2",
                 "--timesteps", "4", "--classes", "x0"])
    dirs = sorted(os.listdir(out))
    assert "0" not in dirs and len(dirs) == 9  # x0 excluded the class

    ref = tmp_path / "ref"
    save_base_main(["--dataset", "synthetic", "--label_to_forget", "0",
                    "--per_class", "2", "--save_dir", str(ref)])
    ref_dirs = sorted(os.listdir(ref))
    assert "0" not in ref_dirs and len(ref_dirs) == 9
    assert len(os.listdir(ref / ref_dirs[0])) == 2


@pytest.mark.slow  # resnet34 @224 on CPU, 2 steps
def test_ddpm_classifier_train_then_eval(tmp_path):
    """The forgotten-class probe: fine-tune the ResNet-34 classifier on a
    capped synthetic set, then evaluate a folder of images
    (classifier_evaluation.py metrics: entropy / forgotten-class prob /
    accuracy)."""
    import json

    import numpy as np
    from PIL import Image

    from salun.cli.ddpm_classifier import main

    ckpt_dir = tmp_path / "cls"
    main(["train", "--dataset", "synthetic", "--limit", "16",
          "--batch_size", "8", "--epochs", "1",
          "--save_dir", str(ckpt_dir)])

    samples = tmp_path / "gen"
    samples.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            samples / f"{i}.png")
    out = tmp_path / "eval"
    main(["eval", "--sample_path", str(samples),
          "--label_of_forgotten_class", "0",
          "--ckpt", str(ckpt_dir / "classifier"),
          "--batch_size", "4", "--save_dir", str(out)])
    results = json.load(open(out / "classifier_eval.json"))
    assert 0.0 <= results["avg_prob_of_forgotten_class"] <= 1.0
    assert results["avg_entropy"] >= 0.0
