from . import attention
from .attention import multi_head_attention, scaled_dot_attention
