"""DDPM ``train_forget`` (Selective Amnesia) golden parity (VERDICT r3 #3).

Every other DDPM mode has a numerical oracle (test_reference_parity.py);
this pins the last one: the SA baseline's composed step —
uniform-noise forget images labeled with the forgotten class +
γ·remember loss (both cond_drop 0, one shared antithetic t) +
λ·EWC(fisher, θ_mle), grad-clip, Adam —
against /root/reference/DDPM/runners/diffusion.py:273-396 run verbatim in
torch on the reference's OWN ``Conditional_Model`` and
``loss_registry_conditional`` (functions/losses.py), weights transported
through the production ckpt.import_ddpm_unet. Randomness: the torch side
consumes the SAME draws the production jitted step makes (the test
mirrors make_train_forget_step's key plumbing outside jit).
"""

import sys
from types import SimpleNamespace as NS

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

# torch-oracle trajectory suites: minutes of CPU stepping + module fixture
pytestmark = pytest.mark.slow

DDPM_REF = "/root/reference/DDPM"

T = 20
N, SIZE, N_CLASSES = 4, 8, 10
GAMMA, LMBDA, LR, GRAD_CLIP = 0.5, 10.0, 1e-3, 1.0
STEPS = 6


def _with_ref_path(path):
    if path in sys.path:
        sys.path.remove(path)
    sys.path.insert(0, path)
    for name, mod in list(sys.modules.items()):
        if name == "models" or name.startswith("models."):
            f = getattr(mod, "__file__", None) or ""
            if not f.startswith(path):
                del sys.modules[name]


def _ref_cfg():
    """Reduced reference config (ch must stay 128 — the reference
    ResnetBlock hardcodes the 4·ch==512 temb width, see
    test_arch_parity.py::test_ddpm_unet_matches_reference_reduced)."""
    return NS(
        model=NS(ch=128, out_ch=3, ch_mult=[1, 2], num_res_blocks=1,
                 attn_resolutions=[4], dropout=0.0, in_channels=3,
                 resamp_with_conv=True, cond_drop_prob=0.1, type="simple",
                 var_type="fixedlarge"),
        data=NS(image_size=SIZE, n_classes=N_CLASSES),
        diffusion=NS(num_diffusion_timesteps=T),
    )


def test_train_forget_matches_reference():
    _with_ref_path(DDPM_REF)
    from functions.losses import loss_registry_conditional
    from models.diffusion import Conditional_Model

    from salun import ckpt
    from salun.diffusion import DiffusionSchedule, UNetConfig
    from salun.diffusion.runner import (DDPMRunner, DDPMTrainConfig,
                                        make_optimizer)

    torch.manual_seed(0)
    tm = Conditional_Model(_ref_cfg())
    tm.train()

    schedule = DiffusionSchedule.create(
        beta_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        num_diffusion_timesteps=T, var_type="fixedlarge")
    unet_cfg = UNetConfig(ch=128, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(4,), dropout=0.0,
                          image_size=SIZE, n_classes=N_CLASSES)
    cfgt = DDPMTrainConfig(lr=LR, grad_clip=GRAD_CLIP, ema=False,
                           gamma=GAMMA, lmbda=LMBDA,
                           label_to_forget=0, random_flip=False)
    runner = DDPMRunner(unet_cfg, schedule, cfgt)
    template = runner.init(jax.random.PRNGKey(0))
    params = ckpt.import_ddpm_unet(tm.state_dict(), template)

    # Fisher dict (random positive, like a real FIM) + θ_mle = initial
    # params; both transported through the production importer so the
    # per-coordinate layouts line up with the transposed weights.
    rng = np.random.default_rng(3)
    fisher_sd = {k: torch.tensor(
        rng.random(tuple(v.shape)).astype(np.float32) * 0.1)
        for k, v in tm.state_dict().items()}
    fisher = ckpt.import_ddpm_unet(fisher_sd, template)
    params_mle = jax.tree.map(jnp.copy, params)
    params_mle_t = {n: p.detach().clone() for n, p in tm.named_parameters()}

    tx = make_optimizer(cfgt)
    step = runner.make_train_forget_step(tx, fisher, params_mle)
    carry = (params, tx.init(params), None)

    topt = torch.optim.Adam(tm.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8)
    betas_t = torch.tensor(np.asarray(schedule.betas, np.float64)
                           .astype(np.float32))
    loss_fn_t = loss_registry_conditional["simple"]

    key = jax.random.PRNGKey(7)
    for i in range(STEPS):
        x_rem01 = rng.random((N, SIZE, SIZE, 3)).astype(np.float32)
        c_rem = rng.integers(1, N_CLASSES, (N,)).astype(np.int32)
        batch = {"image": jnp.asarray(x_rem01), "label": jnp.asarray(c_rem)}
        sub = jax.random.fold_in(key, i)
        carry, loss_j = step(carry, batch, sub)

        # mirror make_train_forget_step's draws (runner.py loss_fn)
        k1, k2, k3, k4, k5, kf = jax.random.split(sub, 6)
        half = jax.random.randint(k1, (N // 2 + 1,), 0, T)
        t_np = np.concatenate(
            [np.asarray(half), T - np.asarray(half) - 1])[:N]
        x_f01 = np.asarray(jax.random.uniform(k2, (N, SIZE, SIZE, 3)))
        e_f = np.asarray(jax.random.normal(k3, (N, SIZE, SIZE, 3)))
        e_r = np.asarray(jax.random.normal(k4, (N, SIZE, SIZE, 3)))

        # ---- reference step, verbatim (diffusion.py:316-371)
        def nchw(a):
            return torch.tensor(a).permute(0, 3, 1, 2)

        t_t = torch.tensor(t_np).long()
        x_forget = nchw(x_f01) * 2.0 - 1.0        # (rand − .5)·2
        x_remember = nchw(x_rem01) * 2.0 - 1.0    # data_transform
        c_f = torch.zeros(N, dtype=torch.long)    # label_to_forget = 0
        loss_t = loss_fn_t(tm, x_forget, t_t, c_f, nchw(e_f), betas_t,
                           cond_drop_prob=0.0)
        loss_t = loss_t + GAMMA * loss_fn_t(
            tm, x_remember, t_t, torch.tensor(c_rem).long(), nchw(e_r),
            betas_t, cond_drop_prob=0.0)
        for name, p in tm.named_parameters():
            loss_t = loss_t + LMBDA * (
                fisher_sd[name] * (p - params_mle_t[name]) ** 2).sum()
        topt.zero_grad()
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), GRAD_CLIP)
        topt.step()

        np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=2e-4,
                                   atol=1e-5, err_msg=f"loss step {i}")

    # Fraction-based trajectory check (same rationale as
    # test_sd_trainer_parity._assert_params_match): Adam walks isolated
    # cancellation-dominated-gradient coords apart at ~lr/step under
    # torch-vs-XLA fp noise, but a composition bug (wrong γ/λ, missing
    # EWC term) moves essentially EVERY coordinate ≳lr·steps.
    want = ckpt.import_ddpm_unet(tm.state_dict(), template)
    n_bad = n_tot = 0
    worst = (0.0, None)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(carry[0]),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(want),
                   key=lambda kv: str(kv[0]))):
        assert ka == kb
        diff = np.abs(np.asarray(a) - np.asarray(b))
        n_bad += int((diff > (1e-5 + 5e-4 * np.abs(np.asarray(b)))).sum())
        n_tot += diff.size
        if diff.max() > worst[0]:
            worst = (float(diff.max()), ka)
    assert n_bad / n_tot <= 5e-4, (
        f"{n_bad}/{n_tot} coords beyond tolerance "
        f"(worst |Δ|={worst[0]:.2e} at {worst[1]})")
    assert worst[0] <= 5e-3, f"max |Δ|={worst[0]:.2e} at {worst[1]}"
