"""CompVis ``sd-v1-4.ckpt`` → flax params importer.

The reverse direction of the reference's 1,128-line CompVis→diffusers
remapper (SD/train-scripts/convertModels.py:61-1128): here the CompVis
state dict maps onto our flax modules, whose names were chosen to mirror
the torch layout (salun.sd.unet/vae/clip_text), so the translation is a
mechanical rename + layout transpose:

- ``model.diffusion_model.*``                → params["unet"]
- ``first_stage_model.*``                    → params["vae"]
- ``cond_stage_model.transformer.text_model.*`` → params["clip"]

Layout rules: conv OIHW→HWIO; linear [out,in]→[in,out]; norm weight→scale;
embeddings stay [vocab, dim].
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().float().numpy()
                      if hasattr(t, "detach") else t)


def load_compvis_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("state_dict", ckpt)


# ------------------------------------------------------------- UNet


def map_unet_key(key: str) -> str:
    """'input_blocks.4.1.transformer_blocks.0.attn1.to_q' →
    'input_blocks_4_1/transformer_blocks_0/attn1/to_q'."""
    k = key
    k = re.sub(r"^(input_blocks|output_blocks)\.(\d+)\.(\d+)$",
               r"\1_\2_\3", k)
    k = re.sub(r"^(input_blocks|output_blocks)\.(\d+)\.(\d+)\.",
               r"\1_\2_\3/", k)
    k = re.sub(r"^middle_block\.(\d+)\.", r"middle_block_\1/", k)
    k = re.sub(r"^time_embed\.(\d+)$", r"time_embed_\1", k)
    k = re.sub(r"^out\.(\d+)$", r"out_\1", k)
    # stem conv: input_blocks_0_0/ with empty remainder
    k = k.rstrip("/")
    k = k.replace("in_layers.0", "in_layers_0")
    k = k.replace("in_layers.2", "in_layers_2")
    k = k.replace("emb_layers.1", "emb_layers_1")
    k = k.replace("out_layers.0", "out_layers_0")
    k = k.replace("out_layers.3", "out_layers_3")
    k = re.sub(r"transformer_blocks\.(\d+)\.", r"transformer_blocks_\1/", k)
    k = k.replace("to_out.0", "to_out_0")
    k = k.replace("ff.net.0.proj", "ff/net_0_proj")
    k = k.replace("ff.net.2", "ff/net_2")
    k = k.replace(".", "/")
    return k


def map_vae_key(key: str) -> str:
    k = key
    k = re.sub(r"(encoder|decoder)\.down\.(\d+)\.block\.(\d+)\.",
               r"\1/down_\2_block_\3/", k)
    k = re.sub(r"(encoder|decoder)\.up\.(\d+)\.block\.(\d+)\.",
               r"\1/up_\2_block_\3/", k)
    k = re.sub(r"(encoder|decoder)\.down\.(\d+)\.downsample\.conv",
               r"\1/down_\2_downsample", k)
    k = re.sub(r"(encoder|decoder)\.up\.(\d+)\.upsample\.conv",
               r"\1/up_\2_upsample", k)
    k = re.sub(r"(encoder|decoder)\.mid\.(block_\d+|attn_1)\.",
               r"\1/mid_\2/", k)
    k = k.replace(".", "/")
    return k


def map_clip_key(key: str) -> str:
    k = key
    k = k.replace("embeddings.token_embedding", "token_embedding")
    k = k.replace("embeddings.position_embedding", "position_embedding")
    k = re.sub(r"encoder\.layers\.(\d+)\.", r"layers_\1/", k)
    k = k.replace(".", "/")
    return k


def _place(flat: Dict[str, np.ndarray], path: str, v: np.ndarray,
           leaf: str, is_embedding: bool = False):
    if leaf == "weight":
        if is_embedding:
            flat[path + "/embedding" if not path.endswith("position_embedding")
                 else path] = v
        elif v.ndim == 4:
            flat[path + "/kernel"] = v.transpose(2, 3, 1, 0)
        elif v.ndim == 2:
            flat[path + "/kernel"] = v.T
        else:
            flat[path + "/scale"] = v
    elif leaf == "bias":
        flat[path + "/bias"] = v
    else:
        raise KeyError(f"{path}.{leaf}")


def _validate_and_build(flat: Dict[str, np.ndarray], template, label: str):
    """flat {name: array} → pytree shaped like ``template`` (strict names
    and shapes — a silent partial import would invalidate parity)."""
    import jax.numpy as jnp

    from salun.utils.tree import flatten_names, tree_from_flat

    tmpl = flatten_names(template)
    missing = set(tmpl) - set(flat)
    extra = set(flat) - set(tmpl)
    if missing or extra:
        raise KeyError(
            f"{label} import mismatch: missing={sorted(missing)[:8]} "
            f"extra={sorted(extra)[:8]}"
        )
    for k in tmpl:
        assert flat[k].shape == tmpl[k].shape, (
            label, k, flat[k].shape, tmpl[k].shape)
    return tree_from_flat({k: jnp.asarray(flat[k]) for k in tmpl})


def import_unet_state(sd: dict, template):
    """Bare ``UNetModel`` state dict (keys like
    ``input_blocks.1.0.in_layers.0.weight``, no ``model.diffusion_model.``
    prefix — the layout random_label.py saves for unet-only checkpoints) →
    flax SDUNet params."""
    flat: Dict[str, np.ndarray] = {}
    for key, tensor in sd.items():
        name, leaf = key.rsplit(".", 1)
        _place(flat, map_unet_key(name), _np(tensor), leaf)
    return _validate_and_build(flat, template, "unet")


def import_vae_part(sd: dict, template, part: str):
    """Bare Encoder/Decoder state dict
    (ldm/modules/diffusionmodules/model.py:379-627) → flax params.
    ``part`` ∈ {encoder, decoder} selects the key-mapping namespace."""
    assert part in ("encoder", "decoder")
    flat: Dict[str, np.ndarray] = {}
    for key, tensor in sd.items():
        name, leaf = key.rsplit(".", 1)
        mapped = map_vae_key(f"{part}.{name}")
        assert mapped.startswith(part + "/"), (key, mapped)
        _place(flat, mapped[len(part) + 1:], _np(tensor), leaf)
    return _validate_and_build(flat, template, part)


def import_clip_state(sd: dict, template):
    """Bare HF ``CLIPTextModel`` state dict (keys with or without the
    ``text_model.`` prefix) → flax CLIPTextModel params."""
    flat: Dict[str, np.ndarray] = {}
    for key, tensor in sd.items():
        if key.startswith("text_model."):
            key = key[len("text_model."):]
        if "position_ids" in key:
            continue
        name, leaf = key.rsplit(".", 1)
        _place(flat, map_clip_key(name), _np(tensor), leaf,
               is_embedding="embedding" in name)
    return _validate_and_build(flat, template, "clip")


def import_compvis(sd: dict, templates: dict) -> dict:
    """Full CompVis state dict → {"unet", "vae", "clip"} params trees.

    ``templates``: the randomly-initialized params from SDModules.init —
    used to validate coverage and shapes.
    """
    import jax.numpy as jnp

    from salun.utils.tree import flatten_names, tree_from_flat

    flats = {"unet": {}, "vae": {}, "clip": {}}
    for key, tensor in sd.items():
        v = _np(tensor)
        if key.startswith("model.diffusion_model."):
            rest = key[len("model.diffusion_model."):]
            name, leaf = rest.rsplit(".", 1)
            _place(flats["unet"], map_unet_key(name), v, leaf)
        elif key.startswith("first_stage_model."):
            rest = key[len("first_stage_model."):]
            name, leaf = rest.rsplit(".", 1)
            _place(flats["vae"], map_vae_key(name), v, leaf)
        elif key.startswith("cond_stage_model.transformer."):
            rest = key[len("cond_stage_model.transformer."):]
            if rest.startswith("text_model."):
                rest = rest[len("text_model."):]
            if "position_ids" in rest:
                continue
            name, leaf = rest.rsplit(".", 1)
            is_emb = "embedding" in name
            _place(flats["clip"], map_clip_key(name), v, leaf,
                   is_embedding=is_emb)
        # other keys (ema, model_ema, betas buffers, logvar) are derived
        # state we recompute — skipped.

    return {part: _validate_and_build(flat, templates[part], part)
            for part, flat in flats.items()}


def _unflax_leaf(name: str, arr: np.ndarray):
    """flax leaf name+layout → torch (weight/bias) name+layout."""
    if name.endswith("/kernel"):
        base = name[: -len("/kernel")]
        if arr.ndim == 4:
            return base + "/weight", arr.transpose(3, 2, 0, 1)
        return base + "/weight", arr.T
    if name.endswith("/scale"):
        return name[: -len("/scale")] + "/weight", arr
    if name.endswith("/embedding"):
        return name[: -len("/embedding")] + "/weight", arr
    return name, arr


def export_compvis_vae(vae_params) -> dict:
    """Our AutoencoderKL params → ``first_stage_model.*``-relative CompVis
    keys (inverse of :func:`map_vae_key`)."""
    from salun.utils.tree import flatten_names

    out = {}
    for k, v in flatten_names(vae_params).items():
        name, arr = _unflax_leaf(k, np.asarray(v))
        name = re.sub(r"(encoder|decoder)/(down|up)_(\d+)_block_(\d+)/",
                      r"\1/\2/\3/block/\4/", name)
        name = re.sub(r"(encoder|decoder)/(down|up)_(\d+)_(downsample|upsample)",
                      r"\1/\2/\3/\4/conv", name)
        name = re.sub(r"(encoder|decoder)/mid_(block_\d+|attn_1)/",
                      r"\1/mid/\2/", name)
        out[name.replace("/", ".")] = arr
    return out


def export_compvis_clip(clip_params) -> dict:
    """Our CLIPTextModel params → ``cond_stage_model.transformer.*``-relative
    HF keys (inverse of :func:`map_clip_key`; position_ids buffer omitted —
    HF regenerates it)."""
    from salun.utils.tree import flatten_names

    out = {}
    for k, v in flatten_names(clip_params).items():
        if k == "position_embedding":  # bare leaf in the flax tree
            out["text_model.embeddings.position_embedding.weight"] = \
                np.asarray(v)
            continue
        name, arr = _unflax_leaf(k, np.asarray(v))
        name = re.sub(r"^layers_(\d+)/", r"encoder/layers/\1/", name)
        if name.startswith("token_embedding"):
            name = "embeddings/" + name
        out["text_model." + name.replace("/", ".")] = arr
    return out


def export_compvis(params: dict) -> dict:
    """Full {"unet","vae","clip"} params → one CompVis-keyed state dict
    (the layout random_label.py:175-199/save_model writes and
    :func:`import_compvis` reads) — reference-format checkpoint interop
    in both directions."""
    sd = {}
    for k, v in export_compvis_unet(params["unet"]).items():
        sd[f"model.diffusion_model.{k}"] = v
    for k, v in export_compvis_vae(params["vae"]).items():
        sd[f"first_stage_model.{k}"] = v
    for k, v in export_compvis_clip(params["clip"]).items():
        sd[f"cond_stage_model.transformer.{k}"] = v
    return sd


def export_compvis_unet(unet_params) -> dict:
    """Our unet params → CompVis-keyed numpy dict (for saving checkpoints
    other tools can read — random_label.py:175-190 saves CompVis format)."""
    from salun.utils.tree import flatten_names

    inv = {}
    for k, v in flatten_names(unet_params).items():
        arr = np.asarray(v)
        name = k.replace("/", ".")
        name = re.sub(r"(input_blocks|output_blocks)_(\d+)_(\d+)\.",
                      r"\1.\2.\3.", name)
        name = re.sub(r"middle_block_(\d+)\.", r"middle_block.\1.", name)
        name = re.sub(r"transformer_blocks_(\d+)\.", r"transformer_blocks.\1.",
                      name)
        name = name.replace("in_layers_0", "in_layers.0")
        name = name.replace("in_layers_2", "in_layers.2")
        name = name.replace("emb_layers_1", "emb_layers.1")
        name = name.replace("out_layers_0", "out_layers.0")
        name = name.replace("out_layers_3", "out_layers.3")
        name = name.replace("to_out_0", "to_out.0")
        name = name.replace("ff.net_0_proj", "ff.net.0.proj")
        name = name.replace("ff.net_2", "ff.net.2")
        name = re.sub(r"time_embed_(\d+)", r"time_embed.\1", name)
        name = re.sub(r"^out_(\d+)", r"out.\1", name)
        if name.endswith(".kernel"):
            base = name[: -len(".kernel")]
            if arr.ndim == 4:
                inv[base + ".weight"] = arr.transpose(3, 2, 0, 1)
            else:
                inv[base + ".weight"] = arr.T
        elif name.endswith(".scale"):
            inv[name[: -len(".scale")] + ".weight"] = arr
        else:
            inv[name] = arr
    return inv
