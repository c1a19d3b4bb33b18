from .mesh import make_mesh, data_sharding, replicated, shard_batch, replicate
from .topk import global_topk_masks, kth_largest
