"""LDM LR schedules vs the reference's own implementations
(SD/ldm/lr_scheduler.py:4-135), run verbatim as oracles."""

import numpy as np
import pytest

from salun.sd.lr_schedules import lambda_linear, warmup_cosine, warmup_cosine2

pytestmark = pytest.mark.quick


# --- oracles: reference lr_scheduler.py CPU-verbatim (no torch needed) ---


class RefWarmUpCosine:
    def __init__(self, warm_up_steps, lr_min, lr_max, lr_start,
                 max_decay_steps):
        self.w, self.mn, self.mx, self.st, self.dk = (
            warm_up_steps, lr_min, lr_max, lr_start, max_decay_steps)

    def __call__(self, n):
        if n < self.w:
            return (self.mx - self.st) / self.w * n + self.st
        t = min((n - self.w) / (self.dk - self.w), 1.0)
        return self.mn + 0.5 * (self.mx - self.mn) * (1 + np.cos(t * np.pi))


class RefCycle:
    def __init__(self, warm_up_steps, f_min, f_max, f_start, cycle_lengths):
        self.w, self.mn, self.mx, self.st, self.cl = (
            warm_up_steps, f_min, f_max, f_start, cycle_lengths)
        self.cum = np.cumsum([0] + list(cycle_lengths))

    def find_in_interval(self, n):
        interval = 0
        for cl in self.cum[1:]:
            if n <= cl:
                return interval
            interval += 1

    def cosine(self, n):
        c = self.find_in_interval(n)
        n = n - self.cum[c]
        if n < self.w[c]:
            return (self.mx[c] - self.st[c]) / self.w[c] * n + self.st[c]
        t = min((n - self.w[c]) / (self.cl[c] - self.w[c]), 1.0)
        return self.mn[c] + 0.5 * (self.mx[c] - self.mn[c]) * (
            1 + np.cos(t * np.pi))

    def linear(self, n):
        c = self.find_in_interval(n)
        n = n - self.cum[c]
        if n < self.w[c]:
            return (self.mx[c] - self.st[c]) / self.w[c] * n + self.st[c]
        return self.mn[c] + (self.mx[c] - self.mn[c]) * (self.cl[c] - n) / (
            self.cl[c])


def test_warmup_cosine_matches_reference():
    ref = RefWarmUpCosine(100, 0.01, 1.0, 0.001, 1000)
    sched = warmup_cosine(100, 0.01, 1.0, 0.001, 1000)
    for n in [0, 1, 50, 99, 100, 101, 500, 999, 1000, 5000]:
        np.testing.assert_allclose(float(sched(n)), ref(n), rtol=1e-6)


def test_lambda_linear_matches_reference():
    # the stable-diffusion training default: one 10B-step cycle, 100-step
    # warmup, f 1.0 → 1.0, start 1e-6
    args = ([100, 200], [0.0, 0.1], [1.0, 0.5], [1e-6, 1e-2], [1000, 2000])
    ref = RefCycle(*args)
    sched = lambda_linear(*args)
    for n in [0, 5, 99, 100, 500, 999, 1000, 1001, 1199, 1200, 2500, 2999]:
        np.testing.assert_allclose(float(sched(n)), ref.linear(n), rtol=1e-5,
                                   err_msg=f"n={n}")


def test_warmup_cosine2_matches_reference():
    args = ([10, 20], [0.0, 0.1], [1.0, 0.5], [0.0, 0.0], [100, 200])
    ref = RefCycle(*args)
    sched = warmup_cosine2(*args)
    for n in [0, 5, 10, 50, 100, 101, 120, 250, 299]:
        np.testing.assert_allclose(float(sched(n)), ref.cosine(n), rtol=1e-5,
                                   err_msg=f"n={n}")


def test_multistep_lr_matches_torch_scheduler():
    """Classification MultiStepLR (impl.py:94-97, epoch-stepped, γ=0.1
    fixed) vs torch.optim.lr_scheduler.MultiStepLR."""
    import torch

    from salun.core.train import multistep_lr

    base, spe, milestones = 0.1, 7, [3, 5]
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones, gamma=0.1)
    ours = multistep_lr(base, milestones, spe)
    for epoch in range(8):
        want = tsched.get_last_lr()[0]
        for j in range(spe):
            np.testing.assert_allclose(
                float(ours(epoch * spe + j)), want, rtol=1e-6,
                err_msg=f"epoch {epoch} step {j}")
        tsched.step()


def test_cosine_warmup_lr_matches_torch_lambda():
    """ImageNet-arch cosine warmup (impl.py:75-93 lambda0, epoch-stepped
    LambdaLR) vs the torch scheduler."""
    import torch

    from salun.core.train import cosine_warmup_lr

    base, spe, warmup, epochs = 0.4, 3, 2, 10
    lambda0 = (
        lambda cur_iter: (cur_iter + 1) / warmup
        if cur_iter < warmup
        else 0.5 * (1.0 + np.cos(
            np.pi * ((cur_iter - warmup) / (epochs - warmup))))
    )
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    tsched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda=lambda0)
    ours = cosine_warmup_lr(base, warmup, epochs, spe)
    for epoch in range(epochs):
        want = tsched.get_last_lr()[0]
        for j in range(spe):
            # f32 cos near pi cancels; torch computes the lambda in f64
            np.testing.assert_allclose(
                float(ours(epoch * spe + j)), want, rtol=1e-5, atol=1e-7,
                err_msg=f"epoch {epoch} step {j}")
        tsched.step()
