"""Unlearning-method registry.

Parity with Classification/unlearn/__init__.py:22-61 get_unlearn_method —
the same 17 names plus ``raw``. Every method has the uniform signature

    method(loaders, model, state, cfg, mask=None, key=None) -> TrainState

(boundary_expanding additionally returns the widened model).
"""

from .common import UnlearnConfig, make_unlearn_optimizer
from .iterative import FT, FT_l1, GA, GA_l1, RL, raw, retrain
from .fisher import fisher, fisher_new
from .wfisher import Wfisher
from .boundary import boundary_expanding, boundary_shrink
from .rl_proximal import RL_proximal
from .prune_variants import FT_prune, FT_prune_bi, GA_prune, GA_prune_bi

_METHODS = {
    "raw": raw,
    "RL": RL,
    "GA": GA,
    "GA_l1": GA_l1,
    "FT": FT,
    "FT_l1": FT_l1,
    "fisher": fisher,
    "fisher_new": fisher_new,
    "retrain": retrain,
    "wfisher": Wfisher,
    "FT_prune": FT_prune,
    "FT_prune_bi": FT_prune_bi,
    "GA_prune": GA_prune,
    "GA_prune_bi": GA_prune_bi,
    "boundary_expanding": boundary_expanding,
    "boundary_shrink": boundary_shrink,
    "RL_proximal": RL_proximal,
}


def get_unlearn_method(name: str):
    if name not in _METHODS:
        raise NotImplementedError(
            f"Unlearn method {name} not implemented! Available: {sorted(_METHODS)}"
        )
    return _METHODS[name]
