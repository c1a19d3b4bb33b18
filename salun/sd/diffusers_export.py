"""Our SD-UNet params → diffusers-format state dict.

Parity with the reference's ``savemodelDiffusers``
(SD/train-scripts/convertModels.py:1006+ / the HF CompVis→diffusers
converter): the unlearned UNet is exported with diffusers keys so the
reference's diffusers-based eval stack (generate-images.py:75-85) can load
it directly.

Key map (sd-v1, 4 levels × 2 res blocks, attention at levels 0-2):
  time_embed.0/2              → time_embedding.linear_1/linear_2
  input_blocks.0.0            → conv_in
  input_blocks.{1+3l+j}.0     → down_blocks.{l}.resnets.{j}
  input_blocks.{1+3l+j}.1     → down_blocks.{l}.attentions.{j}
  input_blocks.{3(l+1)}.0.op  → down_blocks.{l}.downsamplers.0.conv
  middle_block.0/1/2          → mid_block.resnets.0 / attentions.0 / resnets.1
  output_blocks.{3l+j}.0      → up_blocks.{l}.resnets.{j}
  output_blocks.{3l+j}.1      → up_blocks.{l}.attentions.{j} (or upsampler)
  out.0/out.2                 → conv_norm_out / conv_out
ResBlock leaves: in_layers.0→norm1, in_layers.2→conv1,
emb_layers.1→time_emb_proj, out_layers.0→norm2, out_layers.3→conv2,
skip_connection→conv_shortcut.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from salun.utils.tree import flatten_names

_RES_LEAF = {
    "in_layers_0": "norm1",
    "in_layers_2": "conv1",
    "emb_layers_1": "time_emb_proj",
    "out_layers_0": "norm2",
    "out_layers_3": "conv2",
    "skip_connection": "conv_shortcut",
}


def _to_torch_layout(path: str, arr: np.ndarray):
    if path.endswith("/kernel"):
        base = path[: -len("/kernel")]
        if arr.ndim == 4:
            return base + ".weight", arr.transpose(3, 2, 0, 1)
        return base + ".weight", arr.T
    if path.endswith("/scale"):
        return path[: -len("/scale")] + ".weight", arr
    if path.endswith("/bias"):
        return path[: -len("/bias")] + ".bias", arr
    return path.replace("/", "."), arr


def export_diffusers_unet(unet_params, num_levels: int = 4,
                          num_res_blocks: int = 2,
                          attn_levels=(0, 1, 2)) -> Dict[str, np.ndarray]:
    flat = flatten_names(unet_params)
    out: Dict[str, np.ndarray] = {}

    per_level = num_res_blocks + 1  # res blocks + downsample slot

    def map_module(mod: str) -> str:
        if mod == "time_embed_0":
            return "time_embedding.linear_1"
        if mod == "time_embed_2":
            return "time_embedding.linear_2"
        if mod == "out_0":
            return "conv_norm_out"
        if mod == "out_2":
            return "conv_out"
        if mod == "input_blocks_0_0":
            return "conv_in"

        m = re.match(r"input_blocks_(\d+)_(\d+)(?:/(.*))?$", mod)
        if m:
            i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3) or ""
            level = (i - 1) // per_level
            pos = (i - 1) % per_level
            if rest.startswith("op") or rest == "op":
                return f"down_blocks.{level}.downsamplers.0.conv"
            if j == 0:
                return (f"down_blocks.{level}.resnets.{pos}."
                        f"{_map_res(rest)}")
            return (f"down_blocks.{level}.attentions.{pos}."
                    f"{_map_attn(rest)}")

        m = re.match(r"middle_block_(\d+)(?:/(.*))?$", mod)
        if m:
            i, rest = int(m.group(1)), m.group(2) or ""
            if i == 1:
                return f"mid_block.attentions.0.{_map_attn(rest)}"
            return f"mid_block.resnets.{0 if i == 0 else 1}.{_map_res(rest)}"

        m = re.match(r"output_blocks_(\d+)_(\d+)(?:/(.*))?$", mod)
        if m:
            i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3) or ""
            level = i // (num_res_blocks + 1)
            pos = i % (num_res_blocks + 1)
            if rest == "conv" or rest.startswith("conv/"):
                # upsampler (j is 1 or 2 depending on attention presence)
                if j >= 1 and (rest == "conv"):
                    return f"up_blocks.{level}.upsamplers.0.conv"
            if j == 0:
                return f"up_blocks.{level}.resnets.{pos}.{_map_res(rest)}"
            # attention level check: levels are reversed for up blocks
            rev_level = num_levels - 1 - level
            if rev_level in attn_levels and j == 1 and rest != "conv":
                return f"up_blocks.{level}.attentions.{pos}.{_map_attn(rest)}"
            return f"up_blocks.{level}.upsamplers.0.conv"
        raise KeyError(mod)

    def _map_res(rest: str) -> str:
        return _RES_LEAF[rest]

    def _map_attn(rest: str) -> str:
        rest = rest.replace("transformer_blocks_", "transformer_blocks.")
        rest = rest.replace("/", ".")
        rest = rest.replace("to_out_0", "to_out.0")
        rest = rest.replace("ff.net_0_proj", "ff.net.0.proj")
        rest = rest.replace("ff.net_2", "ff.net.2")
        return rest

    for path, value in flat.items():
        arr = np.asarray(value)
        mod, leaf = path.rsplit("/", 1)
        mapped = map_module(mod if leaf in ("kernel", "scale", "bias")
                            else path)
        key, tarr = _to_torch_layout(mapped + "/" + leaf, arr)
        out[key] = tarr
    return out


def save_diffusers_unet(unet_params, path: str):
    """Write a torch-loadable diffusers UNet state dict."""
    sd = export_diffusers_unet(unet_params)
    try:
        import torch

        torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    except ImportError:
        np.savez(path + ".npz", **sd)


def _tag_tree(template):
    """Template with every leaf replaced by a same-shaped int array tagging
    its flax-path index — replaying the export over it recovers the exact
    {flax path → diffusers key} correspondence without duplicating the
    mapping logic."""
    import numpy as _np

    from salun.utils.tree import flatten_names, tree_from_flat

    flat = flatten_names(template)
    tagged = {}
    for i, (k, v) in enumerate(flat.items()):
        tagged[k] = _np.full(v.shape, i, dtype=_np.int64)
    return tree_from_flat(tagged)


def import_diffusers_unet(sd: dict, template, num_levels: int = 4,
                          num_res_blocks: int = 2, attn_levels=(0, 1, 2)):
    """diffusers UNet state dict → flax params matching ``template``
    (reverse of export_diffusers_unet; closes the convertModels.py loop so
    diffusers checkpoints can be trained/evaluated here)."""
    import jax.numpy as jnp

    from salun.utils.tree import flatten_names, tree_from_flat

    flat_t = flatten_names(template)
    tagged_sd = export_diffusers_unet(
        _tag_tree(template), num_levels, num_res_blocks, attn_levels
    )
    # tagged_sd: diffusers key → int array tagged with flax-leaf index
    diffusers_key_of = {}
    for dkey, tag in tagged_sd.items():
        idx = int(np.asarray(tag).flat[0])
        flax_path = list(flat_t)[idx]
        diffusers_key_of[flax_path] = dkey

    out = {}
    for path, tmpl_v in flat_t.items():
        dkey = diffusers_key_of[path]
        if dkey not in sd:
            raise KeyError(f"diffusers ckpt missing {dkey} (for {path})")
        v = np.asarray(sd[dkey])
        if path.endswith("/kernel"):
            if v.ndim == 4:
                v = v.transpose(2, 3, 1, 0)
            else:
                v = v.T
        assert v.shape == tmpl_v.shape, (path, v.shape, tmpl_v.shape)
        out[path] = jnp.asarray(v)
    return tree_from_flat(out)
