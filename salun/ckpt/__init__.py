from .store import (
    exists, from_state_dict, restore, restore_like, restore_sharded, save,
    save_eval_results, save_sharded,
)
from .torch_import import (
    export_ddpm_unet, export_mask, export_resnet, import_ddpm_unet,
    import_mask, import_resnet, import_vgg, load_ddpm_states,
    strip_module_prefix,
)
