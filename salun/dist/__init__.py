from .mesh import make_mesh, data_sharding, replicated, shard_batch, replicate
from .ring_attention import ring_attention
from .topk import global_topk_masks, kth_largest
