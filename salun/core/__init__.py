from .mask import (
    DEFAULT_THRESHOLDS,
    accumulate_saliency,
    accumulate_saliency_scanned,
    generate_masks,
    threshold_mask,
)
from .masked_opt import build_optimizer, mask_grads, masked, sgd
