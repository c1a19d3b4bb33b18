from .unet import SDUNet, SDUNetConfig
from .vae import AutoencoderKL, VAEConfig
from .clip_text import CLIPTextConfig, CLIPTextModel, tokenize
from .ldm import SDModules, sd_schedule
from .import_ckpt import (
    export_compvis_unet, import_compvis, load_compvis_state_dict,
)
from . import data, trainers
