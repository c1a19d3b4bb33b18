from .unet import SDUNet, SDUNetConfig
from .vae import AutoencoderKL, VAEConfig
from .clip_text import CLIPTextConfig, CLIPTextModel, tokenize
from .ldm import SDModules, sd_schedule
from .import_ckpt import (
    export_compvis_unet, import_compvis, load_compvis_state_dict,
)
from .lr_schedules import lambda_linear, warmup_cosine, warmup_cosine2
from .tokenizer import CLIPBPETokenizer, load_clip_tokenizer
from . import data, trainers
