"""SD stack tests on a tiny LatentDiffusion config (SURVEY.md §7 stage 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from salun.sd import (
    AutoencoderKL, CLIPTextConfig, SDModules, SDUNetConfig, VAEConfig,
)
from salun.sd.import_ckpt import export_compvis_unet, import_compvis
from salun.sd.trainers import (
    make_esd_step, make_random_label_step, make_sd_optimizer, proximal_shrink,
    sd_generate_mask, trainable_mask,
)

TINY_UNET = SDUNetConfig(in_channels=4, out_channels=4, model_channels=32,
                         num_res_blocks=1, attention_resolutions=(1, 2),
                         channel_mult=(1, 2), num_heads=2, context_dim=24,
                         transformer_depth=1)
TINY_VAE = VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1,
                     z_channels=4, embed_dim=4)
TINY_CLIP = CLIPTextConfig(vocab_size=49408, hidden_size=24, num_layers=2,
                           num_heads=2, max_length=8)

LATENT = 8
IMG = LATENT * 8


@pytest.fixture(scope="module")
def modules():
    return SDModules.create(TINY_UNET, TINY_VAE, TINY_CLIP, num_timesteps=40)


@pytest.fixture(scope="module")
def params(modules):
    return modules.init(jax.random.PRNGKey(0), image_size=LATENT)


def test_unet_forward(modules, params):
    z = jnp.zeros((2, LATENT, LATENT, 4))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 8, 24))
    out = modules.apply_model(params, z, t, ctx)
    assert out.shape == (2, LATENT, LATENT, 4)


def test_vae_roundtrip_shapes(modules, params):
    x = jnp.zeros((1, IMG, IMG, 3))
    z = modules.encode_image(params, x, jax.random.PRNGKey(1))
    assert z.shape == (1, LATENT, LATENT, 4)
    img = modules.decode_latent(params, z)
    assert img.shape == (1, IMG, IMG, 3)


def test_shared_step_finite(modules, params):
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, IMG, IMG, 3)) * 2 - 1
    ids = jnp.zeros((2, 8), jnp.int32)
    loss = modules.shared_step(params, imgs, ids, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_trainable_subsets(params):
    import jax

    from salun.utils.tree import flatten_names

    for method in ("full", "xattn", "selfattn", "noxattn", "notime"):
        tm = trainable_mask(params["unet"], method)
        flat = flatten_names(tm)
        n_true = sum(bool(v) for v in flat.values())
        assert n_true > 0, method
        if method == "xattn":
            assert all("attn2" in k for k, v in flat.items() if v)
        if method == "full":
            assert n_true == len(flat)


def test_random_label_step_runs(modules, params):
    # zero-init proj_out blocks grads into attn2 at init (correct parity);
    # perturb params so gradient flow is realistic
    keys = jax.random.split(jax.random.PRNGKey(9),
                            len(jax.tree.leaves(params["unet"])))
    leaves, treedef = jax.tree.flatten(params["unet"])
    unet_p = jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)
    ])
    tx = make_sd_optimizer(unet_p, 1e-4, "xattn")
    step = make_random_label_step(modules, tx, alpha=0.5)
    unet0 = jax.tree.map(jnp.copy, unet_p)
    carry = (jax.tree.map(jnp.copy, unet_p), tx.init(unet_p))
    batch = {
        "remain_images": jax.random.uniform(jax.random.PRNGKey(1),
                                            (2, IMG, IMG, 3)) * 2 - 1,
        "remain_ids": jnp.zeros((2, 8), jnp.int32),
        "forget_images": jax.random.uniform(jax.random.PRNGKey(2),
                                            (2, IMG, IMG, 3)) * 2 - 1,
        "forget_ids": jnp.ones((2, 8), jnp.int32),
        "pseudo_ids": 2 * jnp.ones((2, 8), jnp.int32),
    }
    frozen = {k: v for k, v in params.items()}
    carry, loss = step(carry, frozen, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    # only attn2 leaves moved
    from salun.utils.tree import flatten_names

    moved = {
        k: not np.allclose(np.asarray(a), np.asarray(b))
        for (k, a), b in zip(flatten_names(carry[0]).items(),
                             flatten_names(unet0).values())
    }
    assert any(moved.values())
    for k, m in moved.items():
        if m:
            assert "attn2" in k, k


def test_cached_step_matches_uncached(modules, params):
    """The cached-moments random_label step (VAE posterior moments + CLIP
    contexts precomputed once) must reproduce the uncached step's loss and
    parameter update to float rounding — the caching is an algebraic
    rewrite of the reference's per-step frozen-stage recompute
    (ldm/models/diffusion/ddpm.py:913-973), not an approximation."""
    from salun.sd.trainers import make_cache_batch_fn
    import optax

    batch = {
        "remain_images": jax.random.uniform(jax.random.PRNGKey(11),
                                            (2, IMG, IMG, 3)) * 2 - 1,
        "remain_ids": jnp.zeros((2, 8), jnp.int32),
        "forget_images": jax.random.uniform(jax.random.PRNGKey(12),
                                            (2, IMG, IMG, 3)) * 2 - 1,
        "forget_ids": jnp.ones((2, 8), jnp.int32),
        "pseudo_ids": 2 * jnp.ones((2, 8), jnp.int32),
    }
    key = jax.random.PRNGKey(13)
    results = {}
    for cached in (False, "all", "forget"):
        tx = optax.sgd(1e-3)
        step = make_random_label_step(modules, tx, alpha=0.5, cached=cached)
        carry = (jax.tree.map(jnp.copy, params["unet"]),
                 tx.init(params["unet"]))
        b = (make_cache_batch_fn(modules, cached)(params, batch)
             if cached else batch)
        # the "all" mode touches no frozen stage at all inside the step
        frozen = {} if cached == "all" else params
        (unet, _), loss = step(carry, frozen, b, key)
        results[cached] = (unet, float(loss))
    for mode in ("all", "forget"):
        np.testing.assert_allclose(results[mode][1], results[False][1],
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(results[False][0]),
                        jax.tree.leaves(results[mode][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_generate_mask_sd(modules, params):
    imgs = (np.random.RandomState(0).rand(4, IMG, IMG, 3) * 2 - 1).astype(
        np.float32)
    masks = sd_generate_mask(modules, params, imgs, ["x"] * 4,
                             jax.random.PRNGKey(0), batch_size=2,
                             thresholds=(0.5,))
    m = masks[0.5]
    total = sum(int(x.size) for x in jax.tree.leaves(m))
    ones = sum(float(x.sum()) for x in jax.tree.leaves(m))
    assert abs(ones - int(total * 0.5)) < 1


def test_esd_step_runs(modules, params):
    tx = make_sd_optimizer(params["unet"], 1e-5, "xattn")
    step = make_esd_step(modules, tx, ddim_steps=4, image_size=LATENT)
    carry = (jax.tree.map(jnp.copy, params["unet"]), tx.init(params["unet"]))
    ctx = jnp.zeros((1, 8, 24))
    carry, loss = step(carry, params, ctx, ctx, ctx, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_proximal_shrink_pins(modules, params):
    theta0 = jax.tree.map(jnp.copy, params["unet"])
    moved = jax.tree.map(lambda p: p + 0.01, params["unet"])
    n = sum(int(x.size) for x in jax.tree.leaves(moved))
    out = proximal_shrink(moved, theta0, jnp.int32(n))  # pin everything
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(theta0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_compvis_roundtrip(modules, params):
    """export_compvis → import_compvis must be the identity over ALL
    three stages (unet/vae/clip) — the writer sd_train uses for its
    reference-format ``compvis.ckpt`` and the preflight rehearsal uses to
    synthesize a real-format tiny sd-v1-4.ckpt."""
    from salun.sd.import_ckpt import export_compvis

    sd = export_compvis(params)
    assert any(k.startswith("model.diffusion_model.") for k in sd)
    assert any(k.startswith("first_stage_model.") for k in sd)
    assert any(k.startswith("cond_stage_model.transformer.") for k in sd)
    out = import_compvis(sd, params)
    for part in ("unet", "vae", "clip"):
        for a, b in zip(jax.tree.leaves(out[part]),
                        jax.tree.leaves(params[part])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_diffusers_export_structure(modules, params):
    from salun.sd.diffusers_export import export_diffusers_unet

    sd = export_diffusers_unet(params["unet"], num_levels=2,
                               num_res_blocks=1, attn_levels=(0, 1))
    keys = set(sd)
    assert "conv_in.weight" in keys
    assert "time_embedding.linear_1.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in keys
    assert "down_blocks.0.resnets.0.time_emb_proj.weight" in keys
    assert "mid_block.resnets.1.conv1.weight" in keys
    assert "up_blocks.0.upsamplers.0.conv.weight" in keys
    assert "conv_out.weight" in keys
    # torch conv layout
    assert sd["conv_in.weight"].shape == (32, 4, 3, 3)
    # every param exported exactly once
    from salun.utils.tree import flatten_names

    assert len(sd) == len(flatten_names(params["unet"]))


def test_diffusers_roundtrip(modules, params):
    """flax → diffusers → flax must be identity."""
    from salun.sd.diffusers_export import (
        export_diffusers_unet, import_diffusers_unet,
    )

    sd = export_diffusers_unet(params["unet"], num_levels=2,
                               num_res_blocks=1, attn_levels=(0, 1))
    back = import_diffusers_unet(sd, params["unet"], num_levels=2,
                                 num_res_blocks=1, attn_levels=(0, 1))
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params["unet"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_with_mask_state_carried(modules, params):
    """Saliency masking via with_mask (state-carried, no closure literals):
    zeroed-mask leaves must not move even inside the trainable subset."""
    from salun.sd.trainers import with_mask
    from salun.utils.tree import flatten_names

    keys = jax.random.split(jax.random.PRNGKey(11),
                            len(jax.tree.leaves(params["unet"])))
    leaves, treedef = jax.tree.flatten(params["unet"])
    unet_p = jax.tree.unflatten(treedef, [
        l + 0.02 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)
    ])
    # mask: zero out every attn2 to_q leaf, keep the rest
    mask = jax.tree.unflatten(treedef, [jnp.ones_like(l) for l in leaves])
    flat_mask = flatten_names(mask)
    mask_named = {k: (jnp.zeros_like(v) if "to_q" in k else v)
                  for k, v in flat_mask.items()}
    mask = jax.tree.unflatten(jax.tree.structure(mask),
                              list(mask_named.values()))

    tx = with_mask(make_sd_optimizer(unet_p, 1e-3, "xattn"), mask)
    step = make_random_label_step(modules, tx, alpha=0.5)
    unet0 = jax.tree.map(jnp.copy, unet_p)
    carry = (jax.tree.map(jnp.copy, unet_p), tx.init(unet_p))
    batch = {
        "remain_images": jax.random.uniform(jax.random.PRNGKey(1),
                                            (2, IMG, IMG, 3)) * 2 - 1,
        "remain_ids": jnp.zeros((2, 8), jnp.int32),
        "forget_images": jax.random.uniform(jax.random.PRNGKey(2),
                                            (2, IMG, IMG, 3)) * 2 - 1,
        "forget_ids": jnp.ones((2, 8), jnp.int32),
        "pseudo_ids": 2 * jnp.ones((2, 8), jnp.int32),
    }
    carry, loss = step(carry, dict(params), batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    moved = {
        k: not np.allclose(np.asarray(a), np.asarray(b))
        for (k, a), b in zip(flatten_names(carry[0]).items(),
                             flatten_names(unet0).values())
    }
    assert not any(v for k, v in moved.items() if "to_q" in k), \
        "masked-out to_q leaves moved"
    assert any(v for k, v in moved.items()
               if "attn2" in k and "to_q" not in k), \
        "unmasked attn2 leaves should move"


def test_partial_sample_latent_stops_at_t_target(modules, params, rng):
    """quick_sample_till_t parity (train-esd.py:240-252 / ddim.py:280-281):
    the chain must STOP at noise level ~t_target, not denoise through it.
    Verified against a hand-rolled DDIM pair-walk over the same grid with
    a stubbed linear eps model."""
    from unittest import mock

    from salun.sd.ldm import SDModules

    W = (rng.standard_normal((4, 4)) * 0.05).astype(np.float32)

    def stub_apply_model(self, p, z_t, t, context):
        return (jnp.einsum("bhwc,cd->bhwd", z_t, jnp.asarray(W))
                + 0.01 * jnp.reshape(t, (-1, 1, 1, 1)).astype(jnp.float32))

    T = modules.schedule.num_timesteps
    steps = 5
    step_size = T // steps
    t_target = 2 * step_size  # grid point index 2

    key = jax.random.PRNGKey(7)
    ctx = jnp.zeros((2, 3, 8))
    with mock.patch.object(SDModules, "apply_model", stub_apply_model):
        z = modules.partial_sample_latent(
            params, key, ctx, t_target=t_target, steps=steps, image_size=8)

    # hand-rolled expectation: same RNG draw, pair-walk over the fork's
    # DDIM grid (ldm +1-shifted, last entry dropped) stopping AT the
    # lowest grid point >= t_target (transitions seq[k]→seq[k-1])
    from salun.diffusion.sampling import ldm_uniform_timesteps

    seq = [s for s in ldm_uniform_timesteps(T, steps)[:-1] if s >= t_target]
    _, nk = jax.random.split(key)
    want = jax.random.normal(nk, (2, 8, 8, 4))
    acp = np.asarray(modules.schedule.alphas_cumprod)
    for i, j in zip(reversed(seq[1:]), reversed(seq[:-1])):
        at, an = acp[i], acp[j]
        et = (jnp.einsum("bhwc,cd->bhwd", want, jnp.asarray(W))
              + 0.01 * float(i))
        x0 = (want - et * np.sqrt(1 - at)) / np.sqrt(at)
        want = np.sqrt(an) * x0 + np.sqrt(1 - an) * et
    np.testing.assert_allclose(np.asarray(z), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # z is still noisy: its std is near the marginal at t_target (≈1 for
    # eps-matched chains), NOT the fully-denoised scale
    assert float(jnp.std(z)) > 0.5


def test_unet_remat_matches_no_remat(modules, params):
    """SDUNetConfig.remat (the reference's use_checkpoint) must keep the
    parameter tree layout identical (lifted nn.remat preserves names —
    checkpoint import depends on it) and reproduce forward + gradients."""
    from dataclasses import replace

    from salun.sd import SDUNet

    cfg_r = replace(TINY_UNET, remat=True)
    m0, m1 = SDUNet(TINY_UNET), SDUNet(cfg_r)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, LATENT, LATENT, 4))
    t = jnp.ones((2,))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 24))
    p1 = m1.init(jax.random.PRNGKey(2), z, t, ctx)["params"]
    p0 = m0.init(jax.random.PRNGKey(2), z, t, ctx)["params"]
    assert (jax.tree.structure(p0) == jax.tree.structure(p1))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(m, p):
        return jnp.sum(m.apply({"params": p}, z, t, ctx) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(p0)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(p0)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
