from .meters import AverageMeter
from .tree import flatten_names, tree_from_flat, tree_size, tree_zeros_like
from .rng import seed_all
