from .context import (activate, active_mesh, ingest, mesh_from_flags,
                      place_replicated)
from .mesh import make_mesh, data_sharding, replicated, shard_batch, replicate
from .moe import expert_sharding, moe_apply
from .host_offload import offloaded, state_shardings, to_device, to_host
from .multihost import host_local_to_global, initialize, process_shard
from .pipeline import pipeline_apply, stack_stage_params, stage_sharding
from .ring_attention import ring_attention
from .topk import global_topk_masks, kth_largest, kth_largest_threshold
