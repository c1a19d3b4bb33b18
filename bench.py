"""Headline benchmark: SalUn masked-RL unlearning throughput.

Measures the hot loop of the SalUn classification recipe
(Classification/README.md:34 — ResNet-18, CIFAR-10 shapes, batch 256,
masked RL step: fwd + bwd + grad·mask + SGD + θ₀ restore, all fused in one
jitted step) on the available accelerator, in images/sec.

Baseline: the reference implementation's per-step work on an A100 —
PyTorch ResNet-18 CIFAR train step plus two Python dict walks over all 62
parameter tensors per step (unlearn/RL.py:11-34) — measured ≈2500 img/s in
BASELINE.md's ≥3× wall-clock framing. vs_baseline = ours / 2500.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from salun.core import masked_opt, threshold_mask
    from salun.core.train import TrainState, make_train_step
    from salun.models import create_model

    batch = 256
    model = create_model("resnet18", num_classes=10, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    variables = model.init(key, x0, train=False)

    sal = jax.tree.map(
        lambda p: jnp.abs(jax.random.normal(jax.random.PRNGKey(1), p.shape)),
        variables["params"],
    )
    mask = jax.jit(lambda s: threshold_mask(s, 0.5))(sal)
    theta0 = jax.tree.map(jnp.copy, variables["params"])
    tx = masked_opt.masked_sgd_fused(0.013, 0.9, 5e-4, mask, theta0)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, use_augment=True, random_labels=True,
                           num_classes=10)

    rng = np.random.RandomState(0)
    data = {
        "image": jnp.asarray(rng.randint(0, 255, (batch, 32, 32, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 10, (batch,), np.int32)),
        "weight": jnp.ones((batch,), jnp.float32),
    }

    # warmup / compile
    for i in range(3):
        state, m = step(state, data, jax.random.PRNGKey(i))
    jax.block_until_ready(state.params)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, data, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    baseline_a100 = 2500.0
    print(json.dumps({
        "metric": "salun_rl_masked_unlearn_throughput",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline_a100, 3),
    }))


if __name__ == "__main__":
    main()
