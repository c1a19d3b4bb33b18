from .datasets import ArrayDataset, load, synthetic
from .loader import BatchIterator, augment, to_float
from .splits import (
    drop_class, forget_retain_split, replace_class, replace_indexes,
    validation_split,
)
