"""SD YAML config ingestion (VERDICT r2 item #5).

The reference drives its model graph from v1-inference.yaml via
instantiate_from_config (SD/configs/stable-diffusion/v1-inference.yaml,
ldm/util.py:73-89); salun.sd.config maps the same YAML shape onto the
typed dataclasses. Pins: the shipped YAML round-trips into the exact
built-in defaults; a modified YAML changes the built model; unsupported
graph-changing keys raise."""

import copy
import os

import pytest
from dataclasses import replace
import yaml

from salun.sd.clip_text import CLIPTextConfig
from salun.sd.config import load_sd_config, modules_from_config, \
    parse_sd_config
from salun.sd.unet import SDUNetConfig
from salun.sd.vae import VAEConfig

# (no module-level quick mark: conftest auto-applies quick to every test
# not marked slow, and a module mark would force quick onto the slow
# sd_generate_images CLI test below, letting `-m quick` select it)

YAML_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                         "configs", "sd", "v1-inference.yaml")


@pytest.fixture
def v1():
    with open(YAML_PATH) as f:
        return yaml.safe_load(f)


def test_shipped_yaml_roundtrips_to_defaults(v1):
    cfg = parse_sd_config(v1)
    # the shipped yaml trains with use_checkpoint: true → remat=True
    assert cfg.unet == replace(SDUNetConfig(), remat=True)
    assert cfg.vae == VAEConfig()
    assert cfg.clip == CLIPTextConfig()
    assert cfg.timesteps == 1000
    assert cfg.linear_start == 0.00085
    assert cfg.linear_end == 0.0120
    assert cfg.scale_factor == 0.18215


def test_load_from_path_builds_modules():
    mods = modules_from_config(load_sd_config(YAML_PATH))
    assert mods.unet.cfg == replace(SDUNetConfig(), remat=True)
    assert mods.scale_factor == 0.18215
    assert mods.schedule.num_timesteps == 1000


def test_modified_yaml_changes_model(v1):
    v1m = copy.deepcopy(v1)
    p = v1m["model"]["params"]
    p["unet_config"]["params"]["model_channels"] = 64
    p["unet_config"]["params"]["channel_mult"] = [1, 2]
    p["first_stage_config"]["params"]["ddconfig"]["ch"] = 32
    p["scale_factor"] = 0.5
    p["timesteps"] = 500
    cfg = parse_sd_config(v1m)
    assert cfg.unet.model_channels == 64
    assert cfg.unet.channel_mult == (1, 2)
    assert cfg.vae.ch == 32
    assert cfg.vae.scale_factor == 0.5
    mods = modules_from_config(cfg)
    assert mods.schedule.num_timesteps == 500
    assert mods.scale_factor == 0.5


def test_unsupported_graph_keys_raise(v1):
    for mutate, match in [
        (lambda p: p["unet_config"]["params"].update(
            use_scale_shift_norm=True), "use_scale_shift_norm"),
        (lambda p: p["unet_config"]["params"].update(zzz_new_knob=1),
         "unknown params"),
        (lambda p: p["first_stage_config"]["params"]["ddconfig"].update(
            attn_resolutions=[16]), "attn_resolutions"),
        (lambda p: p["unet_config"].update(
            target="my.custom.UNet"), "unsupported target"),
        (lambda p: p["first_stage_config"]["params"]["ddconfig"].update(
            tanh_out=True), "unknown keys"),
        (lambda p: p["first_stage_config"]["params"].update(
            colorize_nlabels=3), "unknown params"),
        (lambda p: p["cond_stage_config"].setdefault("params", {}).update(
            version="openai/clip-vit-base-patch32"), "version"),
        (lambda p: p["cond_stage_config"].setdefault("params", {}).update(
            freeze=True), "unknown params"),
    ]:
        v1m = copy.deepcopy(v1)
        mutate(v1m["model"]["params"])
        with pytest.raises(ValueError, match=match):
            parse_sd_config(v1m)


def test_dtype_override(v1):
    import jax.numpy as jnp

    cfg = parse_sd_config(v1, dtype=jnp.bfloat16)
    assert cfg.unet.dtype == jnp.bfloat16
    assert cfg.vae.dtype == jnp.bfloat16


@pytest.mark.slow  # full-size CLIP text encoder init on CPU
def test_sd_generate_images_cli_from_yaml(tmp_path):
    """End-to-end sd_generate_images driver: tiny-UNet/VAE YAML config
    (full CLIP — the YAML cannot shrink the text-encoder architecture,
    matching FrozenCLIPEmbedder), 2-row prompt CSV, random init, 2 DDIM
    steps at 64px; asserts the flat {case}_{i}.png reference layout."""
    from salun.cli.sd_generate_images import main

    with open(YAML_PATH) as f:
        v1 = yaml.safe_load(f)
    p = v1["model"]["params"]
    p["timesteps"] = 8
    u = p["unet_config"]["params"]
    u.update(model_channels=32, num_res_blocks=1, channel_mult=[1, 2],
             num_heads=2, attention_resolutions=[1, 2])
    d = p["first_stage_config"]["params"]["ddconfig"]
    d.update(ch=32, ch_mult=[1, 1, 1, 1], num_res_blocks=1)
    cfg_path = tmp_path / "tiny-sd.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(v1, f)

    csv_path = tmp_path / "prompts.csv"
    csv_path.write_text(
        "case_number,prompt,evaluation_seed\n"
        "0,hello world,42\n"
        "3,the cat,7\n")

    out = tmp_path / "gen"
    main(["--prompts_path", str(csv_path), "--config", str(cfg_path),
          "--save_path", str(out), "--num_samples", "1",
          "--ddim_steps", "2", "--image_size", "64",
          "--guidance_scale", "3.0"])
    # flat reference layout (generate-images.py:99,192): the filename
    # carries the case_number for the downstream eval scripts
    assert sorted(os.listdir(out)) == ["0_0.png", "3_0.png"]
