#!/usr/bin/env python
"""Asset preflight for real-data parity runs (VERDICT r2 item #3).

This framework's quality-metric parity targets (UA/RA/TA/MIA ±0.5%,
FID 9.6705 / IS 8.1986 — BASELINE.md) need datasets and pretrained
checkpoints that cannot be fetched from a zero-egress container. This
script makes the first hardware-with-assets session turnkey: it checks
presence + checksum of every artifact the parity recipes consume, then
prints the exact command chain to run.

Usage:
    python scripts/preflight_assets.py --root /path/to/assets [--json]

Expected layout under --root (flat; override per-item via env):
    cifar-10-python.tar.gz              (or extracted cifar-10-batches-py/)
    cifar-100-python.tar.gz
    train_32x32.mat test_32x32.mat      (SVHN)
    stl10_binary.tar.gz                 (or extracted stl10_binary/)
    tiny-imagenet-200/                  (extracted tree)
    diffusion_cifar10_model/model-790000.ckpt        (DDPM pretrain)
    ema_diffusion_cifar10_model/model-790000.ckpt
    pt_inception-2015-12-05-6726825d.pth             (FID network)
    sd-v1-4.ckpt                                     (CompVis SD)
    bpe_simple_vocab_16e6.txt.gz                     (CLIP BPE)
    resnet18_cifar10.pth.tar            (optional: pretrained classifier)

Checksum sources: torchvision's published dataset md5s
(torchvision/datasets/{cifar,svhn,stl10}.py), the reference's DDPM ckpt
map (/root/reference/DDPM/functions/ckpt_util.py:7-38). Artifacts without
a trusted pinned checksum are presence-checked and their computed sha256
printed for manual confirmation.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# name → (relpath, md5 | None, what-it-unlocks)
ARTIFACTS = {
    "cifar10": ("cifar-10-python.tar.gz",
                "c58f30108f718f92721af3b95e74349a",
                "classification pretrain/unlearn + DDPM data"),
    "cifar100": ("cifar-100-python.tar.gz",
                 "eb9058c3a382ffc7106e4002c42a8d85",
                 "CIFAR-100 classification workload"),
    "svhn_train": ("train_32x32.mat", "e26dedcc434d2e4c54c9b2d4a06d8373",
                   "SVHN workload"),
    "svhn_test": ("test_32x32.mat", "eb5a983be6a315427106f1b5b1fe1e53",
                  "SVHN workload"),
    "stl10": ("stl10_binary.tar.gz", "91f7769df0f17e558f3565bffb0c7dfb",
              "STL-10 DDPM workload"),
    "tiny_imagenet": ("tiny-imagenet-200", None,
                      "TinyImageNet classification workload"),
    "ddpm_cifar10": ("diffusion_cifar10_model/model-790000.ckpt",
                     "82ed3067fd1002f5cf4c339fb80c4669",
                     "DDPM saliency-unlearn from the public pretrain"),
    "ddpm_ema_cifar10": ("ema_diffusion_cifar10_model/model-790000.ckpt",
                         "1fa350b952534ae442b1d5235cce5cd3",
                         "DDPM sampling from the public EMA pretrain"),
    "pt_inception": ("pt_inception-2015-12-05-6726825d.pth", None,
                     "FID/sFID/IS/P&R evaluation (evalx.inception)"),
    "sd_v1_4": ("sd-v1-4.ckpt", None,
                "SD concept-erasure workload (sd.import_ckpt)"),
    "clip_bpe": ("bpe_simple_vocab_16e6.txt.gz", None,
                 "real CLIP tokenizer ids (sd.tokenizer)"),
    "resnet18_ckpt": ("resnet18_cifar10.pth.tar", None,
                      "skip the 182-epoch pretrain (ckpt.import_resnet)"),
    "imagenette": ("imagenette2", None,
                   "SD class-forgetting data (sd.data.load_imagenette "
                   "extracted-folder layout; a local HF frgfm/imagenette "
                   "cache also works)"),
    "nsfw_df": ("nsfw", None,
                "SD NSFW-removal forget set Df — 800 generated images "
                "(SD/README.md:64-79; cli/sd_train nsfw_removal "
                "--forget_dir)"),
    "nsfw_dr": ("not-nsfw", None,
                "SD NSFW-removal remain set Dr — 800 images "
                "(cli/sd_train nsfw_removal --remain_dir)"),
    "resnet34_imagenet": ("resnet34_imagenet.pth", None,
                          "torchvision ImageNet ResNet-34 init for the "
                          "DDPM classifier fine-tune (cli/ddpm_classifier "
                          "train --init_weights; train_classifier.py:125)"),
    "resnet34_classifier": ("cifar10_resnet34.pth", None,
                            "the reference's fine-tuned DDPM eval "
                            "classifier (cli/ddpm_classifier eval --ckpt "
                            "accepts it directly; else produce one via "
                            "`ddpm_classifier train`)"),
    "resnet50_imagenet": ("resnet50_imagenet.pth", None,
                          "torchvision ImageNet ResNet-50 for the SD "
                          "accuracy eval (cli/sd_eval.py imageclassify "
                          "--classifier_weights)"),
    "imagenet1k": ("imagenet-1k", None,
                   "ImageNet classification workload — an on-disk HF "
                   "DatasetDict (datasets.save_to_disk; "
                   "data/imagenet.py streaming + datasets.imagenet)"),
}

RECIPE = """
# Parity-run command chain (Classification, CIFAR-10, 10% random forgetting;
# reference: Classification/README.md steps 1-3):
python -m salun.cli.main_train    --dataset cifar10 --arch resnet18 \\
    --data {root} --epochs 182 --lr 0.1 --batch_size 256 --save_dir runs/pretrain
python -m salun.cli.generate_mask --dataset cifar10 --arch resnet18 \\
    --data {root} --model_path runs/pretrain/checkpoint \\
    --num_indexes_to_replace 4500 --save_dir runs/mask
python -m salun.cli.main_random   --dataset cifar10 --arch resnet18 \\
    --data {root} --model_path runs/pretrain/checkpoint \\
    --mask_path runs/mask/with_0.5 --unlearn RL --unlearn_lr 0.013 \\
    --unlearn_epochs 10 --num_indexes_to_replace 4500 --save_dir runs/salun
# → UA/RA/TA printed; MIA = SVC_MIA_forget_efficacy["confidence"]x100

# DDPM class forgetting (reference: DDPM/README.md):
python -m salun.cli.ddpm_train --mode generate_mask \\
    --config configs/ddpm/cifar10_generate_mask.yml --data {root} \\
    --ckpt_folder {root}/diffusion_cifar10_model --save_dir runs/ddpm_mask
python -m salun.cli.ddpm_train --mode saliency_unlearn --method rl \\
    --config configs/ddpm/cifar10_saliency_unlearn.yml --data {root} \\
    --ckpt_folder {root}/diffusion_cifar10_model \\
    --mask_path runs/ddpm_mask/mask --save_dir runs/ddpm_unlearn
python -m salun.cli.ddpm_sample --mode sample_fid \\
    --config configs/ddpm/cifar10_sample.yml --ckpt_folder runs/ddpm_unlearn
python -m salun.cli.ddpm_evaluator <generated_dir> <reference_batch_dir> \\
    --inception_weights {root}/pt_inception-2015-12-05-6726825d.pth
# → FID target 9.6705, IS 8.1986 (DDPM/README.md:70-75)

# SD concept erasure (reference: SD/README.md):
export SALUN_CLIP_BPE={root}/bpe_simple_vocab_16e6.txt.gz
python -m salun.cli.sd_train generate_mask --ckpt_path {root}/sd-v1-4.ckpt \\
    --class_to_forget 0 --threshold 0.5 --save_dir runs/sd_mask
python -m salun.cli.sd_train random_label --ckpt_path {root}/sd-v1-4.ckpt \\
    --mask_path runs/sd_mask/with_0.5 --train_method full --lr 1e-5 \\
    --epochs 5 --alpha 0.5 --save_dir runs/sd_unlearn
python -m salun.cli.sd_generate_images --prompts_path prompts/imagenette.csv \\
    --ckpt_path runs/sd_unlearn --save_path evaluation_folder
"""


def _md5(path: str, chunk=1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _sha256(path: str, chunk=1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def check(root: str) -> dict:
    results = {}
    for name, (rel, md5, unlocks) in ARTIFACTS.items():
        path = os.path.join(root, rel)
        # extracted-archive fallbacks count as present
        alt = {
            "cifar10": "cifar-10-batches-py",
            "cifar100": "cifar-100-python",
            "stl10": "stl10_binary",
        }.get(name)
        if not os.path.exists(path) and alt and os.path.isdir(
                os.path.join(root, alt)):
            results[name] = {"status": "present-extracted", "path":
                             os.path.join(root, alt), "unlocks": unlocks}
            continue
        if not os.path.exists(path):
            results[name] = {"status": "MISSING", "path": path,
                             "unlocks": unlocks}
            continue
        if os.path.isdir(path):
            results[name] = {"status": "present", "path": path,
                             "unlocks": unlocks}
            continue
        if md5 is not None:
            got = _md5(path)
            ok = got == md5
            results[name] = {"status": "ok" if ok else "CHECKSUM-MISMATCH",
                             "md5": got, "expected": md5, "path": path,
                             "unlocks": unlocks}
        else:
            results[name] = {"status": "present-unpinned",
                             "sha256": _sha256(path), "path": path,
                             "unlocks": unlocks}
    return results


# --------------------------------------------------------------- rehearsal


DDPM_TINY_YML = """\
data:
  dataset: cifar10
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
  num_diffusion_timesteps: 10
training:
  n_iters: 2
  batch_size: 16
  snapshot_freq: 100
  log_freq: 1
  method: rl
optim:
  lr: 0.0001
  grad_clip: 1.0
sampling:
  cond_scale: 2.0
"""


def _synth_cifar10(root, rng, per_batch=100):
    """cifar-10-batches-py in the REAL pickle layout (b"data" uint8
    [N,3072] CHW-flat + b"labels") — the exact bytes torchvision writes."""
    import pickle

    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    for fn in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        data = rng.integers(0, 256, (per_batch, 3072), dtype=np.uint8)
        labels = [int(i % 10) for i in range(per_batch)]
        with open(os.path.join(base, fn), "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)


def _synth_ddpm_ckpt(root):
    """Reference-format DDPM ``ckpts/ckpt.pth`` (torch pickle of
    [module.-prefixed state_dict, optim_sd, step] —
    DDPM/runners/diffusion.py:252-265) from a tiny ConditionalUNet via the
    export_ddpm_unet inverse mapping."""
    import jax
    import jax.numpy as jnp
    import torch

    from salun.ckpt import export_ddpm_unet
    from salun.diffusion import ConditionalUNet, UNetConfig

    cfg = UNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(16,), dropout=0.0, image_size=32)
    model = ConditionalUNet(cfg)
    params = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32), train=False, cond_drop_prob=0.0,
    )["params"])(jax.random.PRNGKey(0))
    sd = {f"module.{k}": torch.tensor(np.asarray(v))
          for k, v in export_ddpm_unet(params).items()}
    out = os.path.join(root, "diffusion_cifar10_model", "ckpts")
    os.makedirs(out, exist_ok=True)
    torch.save([sd, {}, 0], os.path.join(out, "ckpt.pth"))


def _synth_pt_inception(root):
    """pt_inception-2015-12-05 stand-in: a torch state dict with the
    pytorch-fid names/layouts, inverted from the flax InceptionV3
    template (salun.evalx.inception.load_params consumes it)."""
    import jax
    import jax.numpy as jnp
    import torch

    from salun.evalx.inception import InceptionV3
    from salun.utils.tree import flatten_names

    model = InceptionV3()
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))()
    sd = {}
    for k, v in flatten_names(variables["params"]).items():
        arr = np.asarray(v)
        base, leaf = k.rsplit("/", 1)
        name = base.replace("/", ".")
        if leaf == "kernel":
            if arr.ndim == 4:
                sd[name + ".weight"] = torch.tensor(arr.transpose(3, 2, 0, 1))
            else:
                sd[name + ".weight"] = torch.tensor(arr.T)
        elif leaf == "scale":
            sd[name + ".weight"] = torch.tensor(arr)
        else:
            sd[name + "." + leaf] = torch.tensor(arr)
    for k, v in flatten_names(variables["batch_stats"]).items():
        base, leaf = k.rsplit("/", 1)
        name = base.replace("/", ".")
        sd[name + (".running_mean" if leaf == "mean" else ".running_var")] \
            = torch.tensor(np.asarray(v))
    torch.save(sd, os.path.join(root, "pt_inception-2015-12-05-6726825d.pth"))


SD_TINY_YAML = """\
model:
  base_learning_rate: 1.0e-04
  target: ldm.models.diffusion.ddpm.LatentDiffusion
  params:
    linear_start: 0.00085
    linear_end: 0.0120
    num_timesteps_cond: 1
    log_every_t: 200
    timesteps: 10
    first_stage_key: jpg
    cond_stage_key: txt
    image_size: 8
    channels: 4
    cond_stage_trainable: false
    conditioning_key: crossattn
    monitor: val/loss_simple_ema
    scale_factor: 0.18215
    use_ema: false
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        image_size: 32
        in_channels: 4
        out_channels: 4
        model_channels: 32
        attention_resolutions: [1, 2]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_heads: 2
        use_spatial_transformer: true
        transformer_depth: 1
        context_dim: 768
        use_checkpoint: true
        legacy: false
    first_stage_config:
      target: ldm.models.autoencoder.AutoencoderKL
      params:
        embed_dim: 4
        monitor: val/rec_loss
        ddconfig:
          double_z: true
          z_channels: 4
          resolution: 256
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 1, 1, 1]
          num_res_blocks: 1
          attn_resolutions: []
          dropout: 0.0
        lossconfig:
          target: torch.nn.Identity
    cond_stage_config:
      target: ldm.modules.encoders.modules.FrozenCLIPEmbedder
"""


def _synth_sd_ckpt(root, yaml_path):
    """Tiny CompVis-format ``sd-v1-4.ckpt`` (torch pickle with a
    "state_dict" key) from the tiny yaml's module graph, written through
    the export_compvis inverse mapping."""
    import jax
    import torch

    from salun.sd.config import modules_from_yaml
    from salun.sd.import_ckpt import export_compvis

    modules = modules_from_yaml(yaml_path)
    params = modules.init(jax.random.PRNGKey(0), image_size=8)
    sd = {k: torch.tensor(v)
          for k, v in export_compvis(params).items()}
    torch.save({"state_dict": sd}, os.path.join(root, "sd-v1-4.ckpt"))


def _synth_clip_bpe(root):
    """bpe_simple_vocab_16e6.txt.gz stand-in in the OpenAI merges format
    (header line + space-separated merges)."""
    import gzip

    merges = ["t h", "th e</w>", "a n", "an d</w>", "i n</w>", "o f</w>",
              "r e", "e r", "o n", "a t", "i m", "im a", "g e</w>",
              "ima ge</w>", "o t", "ot o</w>", "p h", "ph ot",
              "phot o</w>"]
    with gzip.open(os.path.join(root, "bpe_simple_vocab_16e6.txt.gz"),
                   "wt") as f:
        f.write("#version: 0.2 (synthetic rehearsal stand-in)\n")
        f.write("\n".join(merges) + "\n")


def _synth_imagenette(root, rng):
    """imagenette2/train folder of tiny JPEGs (the extracted-archive
    layout sd.data.load_imagenette reads when HF is unavailable)."""
    from PIL import Image

    for ci in range(10):
        d = os.path.join(root, "imagenette2", "train", f"n{ci:08d}")
        os.makedirs(d, exist_ok=True)
        for i in range(3):
            arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"im_{i}.jpg"))


def _synth_torchvision_resnet(root, arch, fname):
    """torchvision-format ImageNet classifier .pth stand-in, written from
    a random flax init through the export_resnet inverse mapping
    (roundtrip-pinned by tests/test_torch_import.py)."""
    import jax
    import jax.numpy as jnp
    import torch

    from salun.ckpt import export_resnet
    from salun.models import create_model

    model = create_model(arch, num_classes=1000, imagenet=True)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    sd = {k: torch.tensor(v) for k, v in export_resnet(
        variables["params"], variables["batch_stats"]).items()}
    torch.save(sd, os.path.join(root, fname))


def _synth_imagenet1k(root, rng):
    """imagenet-1k miniature as an on-disk HF DatasetDict
    (datasets.save_to_disk — the layout data/imagenet.py loads)."""
    from datasets import Dataset, DatasetDict
    from PIL import Image

    def split(n):
        return Dataset.from_dict({
            "image": [Image.fromarray(
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
                for _ in range(n)],
            "label": [int(i % 4) for i in range(n)],
        })

    DatasetDict({"train": split(48), "validation": split(16)}).save_to_disk(
        os.path.join(root, "imagenet-1k"))


def _synth_nsfw_dirs(root, rng):
    """nsfw/ and not-nsfw/ image folders (Df/Dr stand-ins for the 800+800
    generated sets, SD/README.md:64-79)."""
    from PIL import Image

    for d in ("nsfw", "not-nsfw"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
        for i in range(4):
            arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(root, d, f"{i}.png"))


def rehearse(root: str) -> int:
    """Full-recipe rehearsal on synthesized stand-in assets in the REAL
    file formats (VERDICT r3 #8): prove the day-one-with-assets command
    chain (RECIPE above) executes end-to-end through the actual CLIs —
    readers, torch-format importers, trainers, samplers, evaluators.
    Numbers are meaningless (random weights/data); the PATH is what this
    certifies. Runs single-device miniatures; wall-clock ~10-20 min on a
    1-core CPU host, seconds on a TPU host."""
    t0 = time.time()
    root = os.path.abspath(root)
    runs = os.path.join(root, "runs")
    os.makedirs(runs, exist_ok=True)
    rng = np.random.default_rng(0)
    legs = []

    def leg(name, fn):
        t = time.time()
        fn()
        legs.append((name, round(time.time() - t, 1)))
        print(f"[rehearse] {name} OK ({legs[-1][1]}s)", flush=True)

    # ---- synthesize stand-ins (real formats)
    leg("synth:cifar10", lambda: _synth_cifar10(root, rng))
    leg("synth:ddpm_ckpt", lambda: _synth_ddpm_ckpt(root))
    leg("synth:pt_inception", lambda: _synth_pt_inception(root))
    ddpm_yml = os.path.join(root, "ddpm_tiny.yml")
    with open(ddpm_yml, "w") as f:
        f.write(DDPM_TINY_YML)
    sd_yaml = os.path.join(root, "sd_tiny.yaml")
    with open(sd_yaml, "w") as f:
        f.write(SD_TINY_YAML)
    leg("synth:sd_ckpt", lambda: _synth_sd_ckpt(root, sd_yaml))
    leg("synth:clip_bpe", lambda: _synth_clip_bpe(root))
    leg("synth:imagenette", lambda: _synth_imagenette(root, rng))
    leg("synth:imagenet1k", lambda: _synth_imagenet1k(root, rng))
    leg("synth:nsfw_dirs", lambda: _synth_nsfw_dirs(root, rng))
    leg("synth:resnet34_imagenet", lambda: _synth_torchvision_resnet(
        root, "resnet34", "resnet34_imagenet.pth"))
    leg("synth:resnet50_imagenet", lambda: _synth_torchvision_resnet(
        root, "resnet50", "resnet50_imagenet.pth"))
    os.environ["SALUN_CLIP_BPE"] = os.path.join(
        root, "bpe_simple_vocab_16e6.txt.gz")

    # ---- classification chain (RECIPE step 1)
    from salun.cli import generate_mask as cli_mask
    from salun.cli import main_random as cli_random
    from salun.cli import main_train as cli_train

    pre = os.path.join(runs, "pretrain")
    leg("cls:main_train", lambda: cli_train.main(
        ["--dataset", "cifar10", "--arch", "resnet18", "--data", root,
         "--epochs", "1", "--batch_size", "64", "--save_dir", pre]))
    maskd = os.path.join(runs, "mask")
    leg("cls:generate_mask", lambda: cli_mask.main(
        ["--dataset", "cifar10", "--arch", "resnet18", "--data", root,
         "--model_path", os.path.join(pre, "model_SA_best"),
         "--num_indexes_to_replace", "45", "--batch_size", "64",
         "--save_dir", maskd]))
    leg("cls:main_random(SalUn-RL)", lambda: cli_random.main(
        ["--dataset", "cifar10", "--arch", "resnet18", "--data", root,
         "--model_path", os.path.join(pre, "model_SA_best"),
         "--mask_path", os.path.join(maskd, "with_0.5"),
         "--unlearn", "RL", "--unlearn_lr", "0.013",
         "--unlearn_epochs", "1", "--batch_size", "64",
         "--num_indexes_to_replace", "45", "--save_dir",
         os.path.join(runs, "salun")]))

    # ---- ImageNet miniature through the same driver path (VERDICT r4
    # weak #7: data/imagenet.py had never executed end-to-end)
    from salun.cli import main_forget as cli_forget

    os.environ["SALUN_IMAGENET_SIZE"] = "64"
    leg("cls:imagenet(main_forget GA)", lambda: cli_forget.main(
        ["--dataset", "imagenet", "--arch", "resnet20s",
         "--data", os.path.join(root, "imagenet-1k"),
         "--unlearn", "GA", "--unlearn_lr", "0.001",
         "--unlearn_epochs", "1", "--batch_size", "16",
         "--decreasing_lr", "2", "--class_to_replace", "0",
         "--num_indexes_to_replace", "8",
         "--save_dir", os.path.join(runs, "imagenet_ga")]))

    # ---- DDPM chain (RECIPE step 2) — exercises load_ddpm_states +
    # import_ddpm_unet on the torch-format ckpt
    from salun.cli import ddpm_evaluator as cli_eval
    from salun.cli import ddpm_sample as cli_sample
    from salun.cli import ddpm_save_base as cli_base
    from salun.cli import ddpm_train as cli_ddpm

    ckpt_folder = os.path.join(root, "diffusion_cifar10_model")
    dmask = os.path.join(runs, "ddpm_mask")
    leg("ddpm:generate_mask", lambda: cli_ddpm.main(
        ["--config", ddpm_yml, "--mode", "generate_mask", "--data", root,
         "--ckpt_folder", ckpt_folder, "--label_to_forget", "0",
         "--save_dir", dmask]))
    dunl = os.path.join(runs, "ddpm_unlearn")
    leg("ddpm:saliency_unlearn", lambda: cli_ddpm.main(
        ["--config", ddpm_yml, "--mode", "saliency_unlearn", "--method",
         "rl", "--data", root, "--ckpt_folder", ckpt_folder,
         "--label_to_forget", "0",
         "--mask_path", os.path.join(dmask, "mask", "0", "with_0.5"),
         "--save_dir", dunl]))
    samples = os.path.join(runs, "ddpm_samples")
    leg("ddpm:sample_fid", lambda: cli_sample.main(
        ["--config", ddpm_yml, "--mode", "sample_fid", "--ckpt_folder",
         dunl, "--save_dir", samples, "--n_samples_per_class", "2",
         "--batch", "2", "--timesteps", "5"]))
    based = os.path.join(runs, "ddpm_base")
    leg("ddpm:save_base_dataset", lambda: cli_base.main(
        ["--dataset", "cifar10", "--data", root, "--label_to_forget", "0",
         "--per_class", "2", "--save_dir", based]))
    leg("ddpm:evaluator(FID/IS/sFID/P&R)", lambda: cli_eval.main(
        [based, samples,
         "--inception_weights",
         os.path.join(root, "pt_inception-2015-12-05-6726825d.pth"),
         "--batch_size", "8",
         "--output_csv", os.path.join(runs, "result.csv")]))

    # ---- DDPM classifier chain: fine-tune from the torchvision-format
    # ImageNet init, then probe the generated samples
    # (train_classifier.py / classifier_evaluation.py)
    from salun.cli import ddpm_classifier as cli_cls

    clsd = os.path.join(runs, "classifier")
    leg("ddpm:train_classifier", lambda: cli_cls.main(
        ["train", "--dataset", "cifar10", "--data", root,
         "--init_weights", os.path.join(root, "resnet34_imagenet.pth"),
         "--batch_size", "8", "--epochs", "1", "--limit", "16",
         "--save_dir", clsd]))
    leg("ddpm:classifier_evaluation", lambda: cli_cls.main(
        ["eval", "--sample_path", os.path.join(samples, "0"),
         "--label_of_forgotten_class", "0",
         "--ckpt", os.path.join(clsd, "classifier"),
         "--save_dir", clsd]))

    # ---- SD chain (RECIPE step 3) — exercises the CompVis importer, the
    # real BPE loader, mask gen, the SalUn trainer, and image generation
    from salun.cli import sd_generate_images as cli_sdgen
    from salun.cli import sd_train as cli_sd

    sd_ckpt = os.path.join(root, "sd-v1-4.ckpt")
    smask = os.path.join(runs, "sd_mask")
    leg("sd:generate_mask", lambda: cli_sd.main(
        ["generate_mask", "--config", sd_yaml, "--ckpt_path", sd_ckpt,
         "--data", root, "--image_size", "64", "--batch_size", "2",
         "--class_to_forget", "0", "--save_dir", smask]))
    sunl = os.path.join(runs, "sd_unlearn")
    leg("sd:random_label(SalUn)", lambda: cli_sd.main(
        ["random_label", "--config", sd_yaml, "--ckpt_path", sd_ckpt,
         "--data", root, "--image_size", "64", "--batch_size", "2",
         "--class_to_forget", "0", "--train_method", "full",
         "--lr", "1e-5", "--epochs", "1", "--alpha", "0.5",
         "--mask_path", os.path.join(smask, "mask", "0", "with_0.5"),
         "--save_dir", sunl]))
    prompts = os.path.join(root, "prompts_tiny.csv")
    with open(prompts, "w") as f:
        f.write("case_number,prompt,evaluation_seed\n"
                "0,an image of a church,42\n"
                "1,an image of a tench,7\n")
    # num_samples 2: compute_fid needs >= 2 images per side for a
    # non-degenerate covariance
    leg("sd:generate_images", lambda: cli_sdgen.main(
        ["--prompts_path", prompts, "--config", sd_yaml,
         "--ckpt_path", os.path.join(sunl, "ckpt"),
         "--save_path", os.path.join(runs, "sd_eval"),
         "--image_size", "64", "--ddim_steps", "4", "--num_samples", "2"]))

    # ---- SD eval chain (VERDICT r4 #6): generated images →
    # imageclassify (torchvision-format ResNet-50 stand-in) → compute_fid
    # → nudenet CSV pipeline with a stub detector
    from salun.cli import sd_eval as cli_sdeval

    leg("sd:imageclassify", lambda: cli_sdeval.main(
        ["imageclassify", "--folder_path", os.path.join(runs, "sd_eval"),
         "--prompts_path", prompts,
         "--classifier_weights", os.path.join(root, "resnet50_imagenet.pth"),
         "--save_path", os.path.join(runs, "sd_classify.csv"),
         "--batch_size", "4"]))
    leg("sd:compute_fid", lambda: cli_sdeval.main(
        ["compute_fid",
         os.path.join(root, "imagenette2", "train", "n00000001"),
         os.path.join(runs, "sd_eval"),
         "--inception_weights",
         os.path.join(root, "pt_inception-2015-12-05-6726825d.pth"),
         "--batch_size", "4"]))

    class _StubDetector:
        def detect(self, image):
            return [{"class": "EXPOSED_BELLY", "score": 0.9}]

    import glob as _glob

    leg("sd:nudenet(stub)", lambda: cli_sdeval.detect_nude_classes(
        _glob.glob(os.path.join(runs, "sd_eval", "*.png")), prompts,
        os.path.join(runs, "sd_nudenet.csv"), 0.0,
        detector=_StubDetector()))

    print(f"\nrehearsal PASSED — {len(legs)} legs in "
          f"{time.time() - t0:.0f}s (assets under {root})")
    for name, dt in legs:
        print(f"  {name:<32} {dt:>7.1f}s")
    print("\nNOT rehearsed (needs the real packages/weights): the NudeNet "
          "detector itself (stub-driven here) and real torchvision "
          "accuracy numbers (classifier weights are random stand-ins).")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.environ.get("SALUN_ASSETS", "assets"))
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--show-recipe", action="store_true",
                    help="print the parity command chain even with "
                         "artifacts missing")
    ap.add_argument("--rehearse", action="store_true",
                    help="synthesize miniature stand-in assets in the real "
                         "file formats under --root and execute the full "
                         "recipe chain through the real CLIs (VERDICT r3 "
                         "#8: prove the day-one-with-assets path runs)")
    args = ap.parse_args(argv)
    if args.rehearse:
        return rehearse(args.root)

    results = check(args.root)
    if args.json:
        print(json.dumps(results, indent=2))
    else:
        width = max(len(n) for n in ARTIFACTS)
        for name, r in results.items():
            print(f"{name:<{width}}  {r['status']:<20} {r['path']}")
            if r["status"] == "MISSING":
                print(f"{'':<{width}}  → unlocks: {r['unlocks']}")
        missing = [n for n, r in results.items() if r["status"] == "MISSING"]
        bad = [n for n, r in results.items()
               if r["status"] == "CHECKSUM-MISMATCH"]
        print()
        if bad:
            print(f"CHECKSUM MISMATCH (re-fetch these): {', '.join(bad)}")
        if missing:
            print(f"missing {len(missing)}/{len(ARTIFACTS)}: "
                  f"{', '.join(missing)}")
            if args.show_recipe:
                print("\nparity recipe (once assets exist):")
                print(RECIPE.format(root=args.root))
        else:
            print("all artifacts present — parity recipe:")
            print(RECIPE.format(root=args.root))
    return 1 if any(r["status"] in ("MISSING", "CHECKSUM-MISMATCH")
                    for r in results.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
