"""Test harness: force the XLA CPU backend with 8 virtual devices so every
pjit/mesh test runs without TPU hardware (SURVEY.md §4 test strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax with JAX_PLATFORMS=axon before
# conftest runs, so the env var alone is ignored; force the config instead.
jax.config.update("jax_platforms", "cpu")

# jax 0.9.0's XLA:CPU backend computes f32 convolutions/dots in reduced
# (bfloat16-like) precision by default (measured: ~1.5% relative error on a
# 3x3 conv vs a float64 oracle). The golden-parity tests compare trajectories
# against torch at 1e-4; pin full-f32 math so test numerics are exact and
# machine-independent.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is compile-dominated on this
# single-core host (~70% of quick-tier wall is XLA compiles of repeated
# model graphs); caching cuts repeat runs to a fraction.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/salun_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Zero-egress test environment: no real CLIP BPE assets exist, and the
# tokenizer refuses to approximate. Point SALUN_CLIP_BPE at a tiny synthetic
# merges file so SD pipeline tests can tokenize (ids are structurally valid
# BPE over the 512-symbol byte alphabet; NOT the real CLIP vocab — real-id
# parity is tested separately and skips without real assets).
_SYNTH_MERGES = os.path.join(
    os.path.dirname(__file__), "_synthetic_clip_merges.txt")
if not os.path.exists(_SYNTH_MERGES):
    _merges = ["t h", "th e</w>", "a n", "an d</w>", "i n</w>", "o f</w>",
               "r e", "e r", "o n", "a t", "e n", "o r", "e s</w>",
               "in g</w>", "h e", "l l", "he ll", "hell o</w>"]
    with open(_SYNTH_MERGES, "w") as _f:
        _f.write("#version: synthetic-test\n" + "\n".join(_merges) + "\n")
os.environ.setdefault("SALUN_CLIP_BPE", _SYNTH_MERGES)


# Tests measured >~40s on the CPU backend (full-suite --durations run, r2).
# Everything else is the quick tier; run these with -m "slow or not slow".
_SLOW = {
    "test_generate_mask_sd",
    "test_remaining_methods_run[fisher_new]",
    "test_ddpm_generate_mask_and_unlearn",
    "test_salun_rl_unlearns",
    "test_random_label_step_runs",
    "test_generate_mask_half",
    "test_ddpm_train_mode",
    "test_generate_mask_cli_synthetic",
    "test_full_salun_pipeline_chain",
    "test_inception_v3_shapes",
    "test_main_random_rl_synthetic",
    "test_masked_train_step_sharding_invariance",
    "test_esd_step_runs",
    "test_fim_runs",
    "test_sd_unet_tp_pspecs",
    "test_saliency_accumulation_sharding_invariance",
    "test_other_methods_run[fisher]",
    "test_other_methods_run[wfisher]",
    "test_ddpm_resume_matches_straight_run",
    "test_main_train_resume_matches_straight_run",
    "test_main_random_resume_skips_unlearning",
    "test_ddpm_unet_matches_reference_cifar10",
    "test_partial_sample_latent_stops_at_t_target",
}


def pytest_collection_modifyitems(config, items):
    # Everything not marked slow is the quick tier (`-m quick`).
    for item in items:
        if item.name in _SLOW:
            item.add_marker(pytest.mark.slow)
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture
def mesh8():
    from salun.dist import make_mesh

    return make_mesh(data=8, model=1)


@pytest.fixture(autouse=True, scope="module")
def _isolate_reference_sys_path():
    """Undo reference-path leakage between test modules.

    The torch-oracle parity suites put /root/reference/{DDPM,SD,
    Classification} at the FRONT of sys.path to import the reference's
    own modules; left in place, the reference's top-level packages
    (``datasets``, ``models``, ``functions``, …) shadow same-named
    site-packages for every later test in the process — e.g. HF
    ``datasets`` resolved to reference DDPM/datasets and broke
    test_main_forget_imagenet_miniature in full-suite runs (r5). Restore
    sys.path and purge reference-loaded modules after each module."""
    import sys as _sys

    saved = list(_sys.path)
    yield
    _sys.path[:] = saved
    for name, mod in list(_sys.modules.items()):
        f = getattr(mod, "__file__", None) or ""
        if f.startswith("/root/reference"):
            del _sys.modules[name]
