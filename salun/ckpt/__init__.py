from .store import restore, save, save_eval_results
from .torch_import import (
    export_mask, import_ddpm_unet, import_mask, import_resnet,
    load_ddpm_states, strip_module_prefix,
)
