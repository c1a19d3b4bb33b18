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
