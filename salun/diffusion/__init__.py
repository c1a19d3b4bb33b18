from .schedules import (
    DiffusionSchedule, antithetic_timesteps, data_transform,
    get_beta_schedule, inverse_data_transform, q_sample,
)
from .unet import ConditionalUNet, UNetConfig, cfg_eps
from .losses import (
    loss_registry, loss_registry_conditional, noise_estimation_loss,
    noise_estimation_loss_conditional,
)
from .sampling import ddpm_steps, generalized_steps, plms_steps, sample_image
from .ema import ema_copy, ema_init, ema_update
