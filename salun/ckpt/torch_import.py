"""PyTorch-checkpoint importers.

Lets the TPU framework consume artifacts produced by the reference:
ResNet/VGG classifier checkpoints (Classification/utils.py save_checkpoint
format), saliency masks (``with_{t}.pt`` dicts of {torch_param_name: 0/1
tensor}, generate_mask.py:82), DDPM ``ckpt.pth`` state lists
(runners/diffusion.py:252-265), and (for SD, see salun.sd.import_ckpt) the
CompVis sd-v1-4 checkpoint.

Conventions translated:
- torch conv weight OIHW → flax HWIO kernel
- torch linear weight [out,in] → flax kernel [in,out]
- BatchNorm weight/bias → scale/bias; running stats → batch_stats
- DataParallel ``module.`` prefixes stripped
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _torch_load(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def strip_module_prefix(sd: dict) -> dict:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


# --------------------------------------------------------------- classifiers


def _resnet_name_map(torch_name: str) -> Tuple[str, ...]:
    """torch ResNet param path → our flax path (salun.models.resnet)."""
    parts = torch_name.split(".")
    if parts[0] in ("conv1", "bn1", "fc"):
        head = {"conv1": "conv1", "bn1": "bn1", "fc": "fc"}[parts[0]]
        return (head,) + tuple(parts[1:])
    if parts[0].startswith("layer"):
        # layer1.0.conv1.weight → layer1_0 / conv1 / weight
        stage = parts[0]
        block = parts[1]
        rest = parts[2:]
        if rest[0] == "downsample":
            sub = "downsample_conv" if rest[1] == "0" else "downsample_bn"
            return (f"{stage}_{block}", sub) + tuple(rest[2:])
        return (f"{stage}_{block}",) + tuple(rest)
    return tuple(parts)


def import_resnet(path_or_sd, num_classes: int = 10):
    """torch ResNet state_dict → (params, batch_stats) flax trees.

    Accepts a file path or an in-memory state dict; unwraps the reference's
    ``{"state_dict": ...}`` checkpoint format (utils.py:44-52).
    """
    sd = path_or_sd
    if isinstance(sd, str):
        sd = _torch_load(sd)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = strip_module_prefix(sd)

    params: Dict = {}
    stats: Dict = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    for name, tensor in sd.items():
        if name.startswith("normalize."):
            continue  # normalization is baked as constants in our models
        if name.endswith("num_batches_tracked"):
            continue
        v = _np(tensor)
        keys = _resnet_name_map(name)
        leaf = keys[-1]
        mod = keys[:-1]
        if leaf == "weight":
            if v.ndim == 4:      # conv OIHW → HWIO
                put(params, mod + ("kernel",), v.transpose(2, 3, 1, 0))
            elif v.ndim == 2:    # linear [out,in] → [in,out]
                put(params, mod + ("kernel",), v.T)
            else:                # batchnorm scale
                put(params, mod + ("scale",), v)
        elif leaf == "bias":
            put(params, mod + ("bias",), v)
        elif leaf == "running_mean":
            put(stats, mod + ("mean",), v)
        elif leaf == "running_var":
            put(stats, mod + ("var",), v)
        else:
            raise KeyError(f"unhandled torch param {name}")

    # flax nests BatchNorm params under e.g. layer1_0/bn1/{scale,bias} with
    # an extra BatchNorm_0 level only when unnamed; our models name them
    # directly, so trees line up as built.
    return params, stats


def import_vgg(path_or_sd, num_classes: int = 10):
    """torch VGG-16-BN state dict (Classification/models/VGG.py:56-107) →
    (params, batch_stats) for salun.models.vgg.VGG.

    Name translation: the torch ``features`` Sequential indices map onto
    conv0..conv12/bn0..bn12 in encounter order; ``classifier.{0,2,4}`` →
    fc1/fc2/fc3. fc1's kernel additionally permutes its input dims — torch
    flattens the 2×2 avgpool output channel-major (C,H,W) while flax
    flattens NHWC (H,W,C)."""
    sd = path_or_sd
    if isinstance(sd, str):
        sd = _torch_load(sd)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = strip_module_prefix(sd)

    # features.N with a 4-D weight is the k-th conv; its bn is features.N+1
    conv_of = {}
    k = 0
    for name in sd:
        if name.startswith("features.") and name.endswith(".weight"):
            idx = int(name.split(".")[1])
            if sd[name].ndim == 4 and idx not in conv_of:
                conv_of[idx] = k
                conv_of[idx + 1] = k  # the BatchNorm right after
                k += 1

    params: Dict = {}
    stats: Dict = {}

    def put(tree, mod, leaf, value):
        tree.setdefault(mod, {})[leaf] = value

    for name, tensor in sd.items():
        if name.startswith("normalize.") or name.endswith(
                "num_batches_tracked"):
            continue
        v = _np(tensor)
        parts = name.split(".")
        if parts[0] == "features":
            ci = conv_of[int(parts[1])]
            leaf = parts[2]
            if leaf == "weight":
                if v.ndim == 4:
                    put(params, f"conv{ci}", "kernel", v.transpose(2, 3, 1, 0))
                else:
                    put(params, f"bn{ci}", "scale", v)
            elif leaf == "bias":
                mod = f"conv{ci}" if sd[
                    name.replace("bias", "weight")].ndim == 4 else f"bn{ci}"
                put(params, mod, "bias", v)
            elif leaf == "running_mean":
                put(stats, f"bn{ci}", "mean", v)
            elif leaf == "running_var":
                put(stats, f"bn{ci}", "var", v)
        elif parts[0] == "classifier":
            if parts[1] in ("weight", "bias"):
                # LTH head: a single Linear named 'classifier'
                # (VGG_LTH.py:51; 1x1 avgpool → no flatten permute needed)
                if parts[1] == "weight":
                    put(params, "classifier", "kernel", v.T)
                else:
                    put(params, "classifier", "bias", v)
                continue
            fc = {"0": "fc1", "2": "fc2", "4": "fc3"}[parts[1]]
            if parts[2] == "weight":
                if fc == "fc1":
                    # [out, C*2*2] channel-major → [out, 2*2*C] HWC-major
                    out, cin = v.shape
                    c = cin // 4
                    v = v.reshape(out, c, 2, 2).transpose(0, 2, 3, 1)
                    v = v.reshape(out, cin)
                put(params, fc, "kernel", v.T)
            else:
                put(params, fc, "bias", v)
        else:
            raise KeyError(f"unhandled torch param {name}")
    head = params.get("fc3") or params.get("classifier")
    got_classes = head["kernel"].shape[1]
    if got_classes != num_classes:
        raise ValueError(
            f"checkpoint head has {got_classes} classes, expected "
            f"{num_classes}")
    return params, stats


# --------------------------------------------------------------- masks


def import_mask(path_or_dict, params_template, name_map=_resnet_name_map):
    """``with_{t}.pt`` {torch_name: 0/1 tensor} → mask pytree matching our
    params (unused entries default to 1)."""
    import jax.numpy as jnp

    md = path_or_dict
    if isinstance(md, str):
        md = _torch_load(md)
    md = strip_module_prefix(md)

    flat = {}
    for name, tensor in md.items():
        v = _np(tensor).astype(np.float32)
        keys = name_map(name)
        leaf = keys[-1]
        mod = "/".join(keys[:-1])
        if leaf == "weight":
            if v.ndim == 4:
                flat[mod + "/kernel"] = v.transpose(2, 3, 1, 0)
            elif v.ndim == 2:
                flat[mod + "/kernel"] = v.T
            else:
                flat[mod + "/scale"] = v
        elif leaf == "bias":
            flat[mod + "/bias"] = v

    from salun.utils.tree import flatten_names, tree_from_flat

    tmpl = flatten_names(params_template)
    out = {}
    for k, p in tmpl.items():
        if k in flat:
            assert flat[k].shape == p.shape, (k, flat[k].shape, p.shape)
            out[k] = jnp.asarray(flat[k])
        else:
            out[k] = jnp.ones_like(p, jnp.float32)
    return tree_from_flat(out)


def export_resnet(params, batch_stats) -> Dict[str, np.ndarray]:
    """Our flax ResNet trees → torchvision-style state-dict names/layouts
    — the exact inverse of :func:`import_resnet` (conv HWIO→OIHW, linear
    kernel→weight.T, scale→weight, batch_stats→running_*). Used to write
    reference-consumable classifier checkpoints and to synthesize
    rehearsal stand-ins for the torchvision weights the eval CLIs expect
    (cli/sd_eval.py imageclassify --classifier_weights,
    cli/ddpm_classifier eval)."""
    from salun.utils.tree import flatten_names

    def torch_name(flat: str) -> str:
        parts = flat.split("/")
        head = parts[0]
        if "_" in head and head.startswith("layer"):
            stage, block = head.rsplit("_", 1)
            rest = parts[1:]
            if rest and rest[0] in ("downsample_conv", "downsample_bn"):
                idx = "0" if rest[0] == "downsample_conv" else "1"
                rest = ["downsample", idx] + rest[1:]
            return ".".join([stage, block] + rest)
        return ".".join(parts)

    out: Dict[str, np.ndarray] = {}
    for k, v in flatten_names(params).items():
        arr = np.asarray(v)
        name = torch_name(k)
        base, leaf = name.rsplit(".", 1)
        if leaf == "kernel":
            if arr.ndim == 4:
                out[base + ".weight"] = arr.transpose(3, 2, 0, 1)
            else:
                out[base + ".weight"] = arr.T
        elif leaf == "scale":
            out[base + ".weight"] = arr
        else:
            out[name] = arr
    for k, v in flatten_names(batch_stats).items():
        name = torch_name(k)
        base, leaf = name.rsplit(".", 1)
        out[base + (".running_mean" if leaf == "mean"
                    else ".running_var")] = np.asarray(v)
    return out


def export_mask(mask_tree, name_map_inverse=None) -> dict:
    """Our mask pytree → {torch-style name: numpy 0/1} dict for interop."""
    from salun.utils.tree import flatten_names

    out = {}
    for k, v in flatten_names(mask_tree).items():
        arr = np.asarray(v)
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO → OIHW
        elif arr.ndim == 2:
            arr = arr.T
        out[k] = arr
    return out


# --------------------------------------------------------------- DDPM


def load_ddpm_states(path: str):
    """DDPM ``ckpt.pth``: [model_sd, optim_sd, step, (ema_sd)]
    (runners/diffusion.py:252-265). Returns (model_sd, step, ema_sd|None)."""
    states = _torch_load(path)
    model_sd = strip_module_prefix(states[0])
    step = int(states[2]) if len(states) > 2 else 0
    ema_sd = strip_module_prefix(states[3]) if len(states) > 3 else None
    return model_sd, step, ema_sd


def export_ddpm_unet(params) -> Dict[str, np.ndarray]:
    """Our ConditionalUNet params → torch Conditional_Model state-dict
    names/layouts (the exact inverse of :func:`import_ddpm_unet`) — for
    writing reference-format DDPM checkpoints
    (runners/diffusion.py:252-265) that the reference's own tooling (or
    our importer, in the preflight rehearsal) can consume."""
    import re

    from salun.utils.tree import flatten_names

    out: Dict[str, np.ndarray] = {}
    for flat, v in flatten_names(params).items():
        arr = np.asarray(v)
        if flat == "null_classes_emb":
            out[flat] = arr
            continue
        mod, leaf = flat.rsplit("/", 1)
        # leaf layout inversion
        if leaf == "kernel":
            if arr.ndim == 4:
                arr, tleaf = arr.transpose(3, 2, 0, 1), "weight"
            else:
                arr, tleaf = arr.T, "weight"
        elif leaf == "scale":
            tleaf = "weight"
        elif leaf == "embedding":
            tleaf = "weight"
        else:
            tleaf = leaf  # bias
        # module-name inversion (see import_ddpm_unet.map_name)
        m = re.fullmatch(r"(temb|cemb)_dense(\d+)", mod)
        if m:
            name = f"{m.group(1)}.dense.{m.group(2)}"
        elif mod == "classes_emb":
            name = "classes_emb"
        elif mod in ("conv_in", "conv_out", "norm_out"):
            name = mod
        elif re.fullmatch(r"(down|up)_\d+_(block|attn)_\d+/\w+", mod):
            side, lvl, kind, idx, sub = re.fullmatch(
                r"(down|up)_(\d+)_(block|attn)_(\d+)/(\w+)", mod).groups()
            name = f"{side}.{lvl}.{kind}.{idx}.{sub}"
        elif re.fullmatch(r"(down|up)_\d+_(downsample|upsample)/conv", mod):
            side, lvl, kind = re.fullmatch(
                r"(down|up)_(\d+)_(downsample|upsample)/conv", mod).groups()
            name = f"{side}.{lvl}.{kind}.conv"
        elif re.fullmatch(r"mid_\w+/\w+", mod):
            blk, sub = mod[len("mid_"):].split("/")
            name = f"mid.{blk}.{sub}"
        else:
            raise KeyError(flat)
        out[f"{name}.{tleaf}"] = arr
    return out


def import_ddpm_unet(sd: dict, params_template):
    """torch Conditional_Model state dict → our ConditionalUNet params.

    Name translation: temb.dense.0 → temb_dense0, down.0.block.1 →
    down_0_block_1, mid.block_1 → mid_block_1, classes_emb.weight →
    classes_emb/embedding, plus conv/linear layout transposes.
    """
    import jax.numpy as jnp

    from salun.utils.tree import flatten_names, tree_from_flat

    def map_name(name: str):
        p = name.split(".")
        if p[0] == "temb":
            return f"temb_dense{p[2]}", p[3]
        if p[0] == "cemb":
            return f"cemb_dense{p[2]}", p[3]
        if p[0] == "classes_emb":
            return "classes_emb", "embedding"
        if p[0] == "null_classes_emb":
            return None, "null_classes_emb"
        if p[0] in ("conv_in", "conv_out", "norm_out"):
            return p[0], p[1]
        if p[0] in ("down", "up"):
            lvl = p[1]
            if p[2] == "block":
                base = f"{p[0]}_{lvl}_block_{p[3]}"
                sub = p[4]  # norm1/conv1/temb_cemb_proj/norm2/conv2/nin_shortcut
                return f"{base}/{sub}", p[5]
            if p[2] == "attn":
                base = f"{p[0]}_{lvl}_attn_{p[3]}"
                return f"{base}/{p[4]}", p[5]
            if p[2] in ("downsample", "upsample"):
                return f"{p[0]}_{lvl}_{p[2]}/conv", p[4]
        if p[0] == "mid":
            base = f"mid_{p[1]}"
            return f"{base}/{p[2]}", p[3]
        raise KeyError(name)

    flat = {}
    for name, tensor in sd.items():
        v = _np(tensor)
        mod, leaf = map_name(name)
        prefix = (mod + "/") if mod else ""
        if leaf == "weight":
            if v.ndim == 4:
                flat[prefix + "kernel"] = v.transpose(2, 3, 1, 0)
            elif v.ndim == 2:
                flat[prefix + "kernel"] = v.T
            else:  # group norm scale
                flat[prefix + "scale"] = v
        elif leaf == "bias":
            flat[prefix + "bias"] = v
        elif leaf == "embedding":
            flat[prefix + "embedding"] = v
        elif leaf == "null_classes_emb":
            flat["null_classes_emb"] = v
        else:
            raise KeyError(f"{name} → {leaf}")

    tmpl = flatten_names(params_template)
    missing = set(tmpl) - set(flat)
    extra = set(flat) - set(tmpl)
    if missing or extra:
        raise KeyError(f"DDPM import mismatch; missing={sorted(missing)[:5]} "
                       f"extra={sorted(extra)[:5]}")
    out = {k: jnp.asarray(flat[k]).reshape(tmpl[k].shape) for k in tmpl}
    return tree_from_flat(out)
