"""Benchmarks for the SalUn-TPU hot paths, on the real cost centers.

Headline (the ONE stdout JSON line the driver records): the north-star
chain — saliency mask generation + the 10-epoch SalUn-RL unlearn
wall-clock at the CIFAR-10 ResNet-18 README recipe (BASELINE.md;
Classification/README.md:23,34). Secondary metrics go to stderr, in
priority order under the elapsed-time budget:

  - the SD v1 workload at the true 859.5M-param shape: the composed
    random_label step (strict + cached-moments modes) and the
    ``sd_salun_chain`` 5-epoch recipe extrapolation (SD/README.md:25);
  - the DDPM saliency chain (mask-gen + 1,000-iter unlearn,
    configs/cifar10_saliency_unlearn.yml) and the flagship DDPM
    unlearn step (diffusion.py:519-595);
  - DDIM sampling throughput (the FID-eval cost center);
  - ResNet-18 mask-gen (saliency accumulation + the full 0.1-1.0
    threshold sweep, with the torch-CPU double-argsort sweep measured
    in-process for an honest algorithmic ratio) and the classification
    masked-RL step.

vs_baseline derivation (documented, not hand-waved): the reference runs
this exact step in *eager fp32* torch on A100 — no AMP anywhere in the
repo (grep: no autocast/GradScaler), so its matmul/conv ceiling is the
A100 TF32 tensor-core peak of 156 TFLOP/s (cudnn convs use TF32 by
default; fp32 CUDA-core peak is only 19.5, and torch 2.0 leaves
`matmul.allow_tf32=False`, so 156 is already the generous end). We count
the step's actual FLOPs with XLA's cost model and grant the reference 30%
MFU of that TF32 peak — high for eager convnets plus its per-step Python
mask walk over every parameter tensor (diffusion.py:589-592) and
DataParallel scatter/gather. baseline_steps/s = 156e12 * 0.30 /
FLOPs_per_step; vs_baseline = ours / baseline. Our own MFU is reported
per metric against our own chip's bf16 peak.
"""

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: repeat bench runs (and anything else in this
# container) skip the multi-minute remote XLA compiles.
from salun.utils.tpu_bench import enable_compile_cache

enable_compile_cache()

A100_TF32_PEAK = 156e12
A100_ASSUMED_MFU = 0.30

PEAK_BF16 = {  # per-chip dense bf16 peak FLOP/s
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
}


def _peak():
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_BF16.items():
        if k in kind:
            return v, kind
    return 197e12, kind


def _aot(jitted, *args):
    """AOT-compile a jitted fn ONCE; return (callable, flops).

    Compiling through `.lower().compile()` and then calling the compiled
    executable directly gives both the XLA cost model and the benchmark
    timings from a single compilation (calling the jitted fn would
    trigger a second, separate compile in the jit cache — multi-minute
    over the axon remote-compile tunnel)."""
    t0 = time.perf_counter()
    lowered = jitted.lower(*args)
    _log({"aot_lower_s": round(time.perf_counter() - t0, 1)})
    t0 = time.perf_counter()
    compiled = lowered.compile()
    _log({"aot_compile_s": round(time.perf_counter() - t0, 1)})
    t0 = time.perf_counter()
    try:
        analysis = compiled.cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0.0))
    except Exception:
        flops = 0.0
    _log({"aot_cost_analysis_s": round(time.perf_counter() - t0, 1)})
    return compiled, flops


_T0 = time.perf_counter()


def _log(obj):
    obj = {"t_s": round(time.perf_counter() - _T0, 1), **obj}
    print(json.dumps(obj), file=sys.stderr, flush=True)


# ------------------------------------------------------------------ DDPM


def bench_ddpm_salun_step():
    _log({"phase": "ddpm_start"})
    from salun.core import threshold_mask
    from salun.diffusion import DiffusionSchedule, UNetConfig
    from salun.diffusion.runner import DDPMRunner, DDPMTrainConfig, \
        make_optimizer

    bs = 128
    cfgt = DDPMTrainConfig(ema=False, method="rl", alpha=1e-3, lr=1e-4,
                           batch_size=bs)
    # bf16 compute (fp32 params/optimizer) — the TPU-native configuration;
    # the reference trains fp32 eager torch with no AMP.
    unet_cfg = UNetConfig(dtype=jnp.bfloat16)
    schedule = DiffusionSchedule.create(
        beta_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        num_diffusion_timesteps=1000, var_type="fixedlarge")
    runner = DDPMRunner(unet_cfg, schedule, cfgt)

    key = jax.random.PRNGKey(0)
    params = runner.init(key)

    # one jitted program for the synthetic saliency + mask (eager per-leaf
    # ops cost a remote dispatch each over the axon tunnel)
    @jax.jit
    def _mk_mask(params):
        sal = jax.tree.map(
            lambda p: jnp.abs(jax.random.normal(
                jax.random.PRNGKey(1), p.shape)), params)
        return threshold_mask(sal, 0.5)

    mask = _mk_mask(params)
    tx = make_optimizer(cfgt, mask=mask)
    # eager init, NOT jitted: the mask rides in the opt state, and a
    # jitted init would embed it back into the graph as HLO literals
    opt_state = tx.init(params)
    carry = (params, opt_state, None)
    step = runner.make_saliency_unlearn_step(tx, mask=mask)

    rng = np.random.RandomState(0)

    def batch(label):
        return {
            "image": jnp.asarray(
                rng.randint(0, 255, (bs, 32, 32, 3), np.uint8)),
            "label": jnp.full((bs,), label, jnp.int32),
        }

    remain, forget = batch(1), batch(0)
    _log({"phase": "ddpm_aot_start"})
    step_c, flops = _aot(step, carry, remain, forget, key)
    _log({"phase": "ddpm_aot_done"})

    for i in range(2):
        carry, loss = step_c(carry, remain, forget, jax.random.PRNGKey(i))
    float(loss)  # scalar fetch — block_until_ready can no-op on axon

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        carry, loss = step_c(carry, remain, forget, jax.random.PRNGKey(10 + i))
    # the carry chain is serial, so fetching the LAST loss forces all
    # iterations; block_until_ready on arrays is not reliable here
    float(loss)
    dt = time.perf_counter() - t0

    steps_s = iters / dt
    ips = bs * steps_s  # reference accounting: bs=128 per iteration
    peak, kind = _peak()
    mfu = flops * steps_s / peak if flops else None
    baseline_steps_s = (
        A100_TF32_PEAK * A100_ASSUMED_MFU / flops) if flops else None
    vs = steps_s / baseline_steps_s if baseline_steps_s else None
    _log({"metric": "ddpm_salun_rl_unlearn_step", "images_per_sec": round(ips, 1),
          "steps_per_sec": round(steps_s, 3), "flops_per_step": flops,
          "mfu": round(mfu, 4) if mfu else None, "device": kind,
          "a100_baseline_steps_per_sec":
              round(baseline_steps_s, 3) if baseline_steps_s else None})
    return {
        "metric": "ddpm_salun_rl_unlearn_throughput",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(vs, 3) if vs else 0.0,
        "_flops": flops,  # internal: consumed by bench_ddpm_sampling
    }


def bench_ddpm_chain():
    """DDPM north-star chain (VERDICT r3 #4): mask generation over the
    5,000-image forget class + the full 1,000-iteration saliency unlearn
    at the reference recipe (configs/cifar10_saliency_unlearn.yml: bs 128
    remain + 128 forget, Adam 1e-4, grad clip 1.0, mask with_0.5;
    DDPM/README.md:39) as ONE wall-clock.

    A100 baseline: same derivation as the classification chain — the
    reference runs this loop in eager fp32 torch via DataParallel
    (diffusion.py:482-619), granted 30% MFU of the 156 TFLOP/s TF32 peak
    on the unlearn steps' XLA-counted FLOPs; mask-gen FLOPs are EXCLUDED
    from the baseline while its wall-clock is included in ours
    (conservative, baseline's favor). Batches are synthetic and
    device-resident — both sides' accounting excludes host IO."""
    _log({"phase": "ddpm_chain_start"})
    from salun.diffusion import DiffusionSchedule, UNetConfig
    from salun.diffusion.runner import DDPMRunner, DDPMTrainConfig, \
        make_optimizer

    bs, n_iters = 128, 1000
    cfgt = DDPMTrainConfig(ema=False, method="rl", alpha=1e-3, lr=1e-4,
                           batch_size=bs, n_iters=n_iters)
    unet_cfg = UNetConfig(dtype=jnp.bfloat16)
    schedule = DiffusionSchedule.create(
        beta_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        num_diffusion_timesteps=1000, var_type="fixedlarge")
    runner = DDPMRunner(unet_cfg, schedule, cfgt)
    params = runner.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)

    def batch(label, n=bs):
        return {
            "image": jnp.asarray(
                rng.randint(0, 255, (n, 32, 32, 3), np.uint8)),
            "label": jnp.full((n,), label, jnp.int32),
        }

    # ---- stage 1: mask generation (diffusion.py:933-1039 — one pass over
    # the forget class, 5,000 CIFAR images at the config batch size)
    forget_batches = [batch(0) for _ in range(5000 // bs)]
    # Warm with the FULL batch list: the 39-batch call takes the scanned
    # fast path (runner.py:137-163) whose program differs from the
    # streamed single-batch one — r4 warmed with forget_batches[:1] and
    # billed ~85 s of XLA compile to the timed mask-gen, understating the
    # chain headline by ~70% (VERDICT r4 weak #2).
    runner.generate_mask(params, forget_batches, jax.random.PRNGKey(9))
    t0 = time.perf_counter()
    masks = runner.generate_mask(params, forget_batches,
                                 jax.random.PRNGKey(10))
    mask = masks[0.5]
    jax.tree.leaves(mask)[0].block_until_ready()
    maskgen_s = time.perf_counter() - t0

    # ---- stage 2: 1,000-iter masked RL saliency unlearn
    tx = make_optimizer(cfgt, mask=mask)
    opt_state = tx.init(params)
    carry = (params, opt_state, None)
    step = runner.make_saliency_unlearn_step(tx, mask=mask)
    remain, forget = batch(1), batch(0)

    chunk = 100

    @jax.jit
    def run_chunk(carry, remain, forget, key):
        def body(c, k):
            return step(c, remain, forget, k)

        return jax.lax.scan(body, carry, jax.random.split(key, chunk))

    _log({"phase": "ddpm_chain_aot_start"})
    crun, _ = _aot(run_chunk, carry, remain, forget, jax.random.PRNGKey(1))
    # per-step FLOPs from the single-step program (XLA counts a scan body
    # once regardless of trip count)
    _, flops_step = _aot(step, carry, remain, forget, jax.random.PRNGKey(1))
    _log({"phase": "ddpm_chain_aot_done"})
    carry, losses = crun(carry, remain, forget, jax.random.PRNGKey(2))
    float(losses[-1])  # warm + force

    t0 = time.perf_counter()
    for i in range(n_iters // chunk):
        carry, losses = crun(carry, remain, forget,
                             jax.random.PRNGKey(20 + i))
    float(losses[-1])  # serial carry: last fetch forces all chunks
    unlearn_s = time.perf_counter() - t0

    chain_s = maskgen_s + unlearn_s
    flops_total = flops_step * n_iters
    baseline_s = (flops_total / (A100_TF32_PEAK * A100_ASSUMED_MFU)
                  if flops_total else None)
    vs = baseline_s / chain_s if baseline_s else None
    peak, kind = _peak()
    _log({"metric": "ddpm_saliency_chain",
          "maskgen_s": round(maskgen_s, 2),
          "unlearn_1000iter_s": round(unlearn_s, 2),
          "chain_s": round(chain_s, 2),
          "flops_per_step": flops_step,
          "in_chain_mfu": round(flops_total / unlearn_s / peak, 4)
          if flops_total else None,
          "a100_baseline_s": round(baseline_s, 2) if baseline_s else None,
          "vs_baseline_per_chip": round(vs, 3) if vs else None,
          "device": kind})
    return vs


# ------------------------------------------------------------- sampling


def bench_ddpm_sampling(step_flops=None):
    """DDIM sampling throughput (the FID-eval cost center: the reference
    samples 5,000/class with 1,000 DDIM steps and a per-step CPU offload,
    denoising.py:31,93; ours is one on-device lax.scan).

    Timing: iteration-count slope between a 100-step and a 20-step chain
    with a scalar fetch — robust against the remote backend's unreliable
    block_until_ready (see docs/BENCHMARKS.md timing notes).
    """
    _log({"phase": "sampling_start"})
    from salun.diffusion import ConditionalUNet, DiffusionSchedule, UNetConfig
    from salun.diffusion.sampling import sample_image

    bs = 128
    cfg = UNetConfig(dtype=jnp.bfloat16)
    model = ConditionalUNet(cfg)
    schedule = DiffusionSchedule.create(
        beta_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        num_diffusion_timesteps=1000, var_type="fixedlarge")
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: model.init(
        {"params": k}, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32), train=False,
        cond_drop_prob=0.0)["params"])(key)
    labels = jnp.zeros((bs,), jnp.int32)

    def make(nsteps):
        @jax.jit
        def run(params, key):
            x = sample_image(
                model, {"params": params}, schedule, key, batch=bs,
                image_size=32, channels=3, classes=labels, cond_scale=2.0,
                timesteps=nsteps)
            return jnp.sum(x.astype(jnp.float32))
        return run

    hi, lo = 100, 20
    c_hi, f_hi = _aot(make(hi), params, key)
    c_lo, f_lo = _aot(make(lo), params, key)
    float(c_hi(params, key)); float(c_lo(params, key))  # warm
    ths, tls = [], []
    for i in range(3):
        t0 = time.perf_counter()
        float(c_hi(params, jax.random.PRNGKey(i)))
        ths.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(c_lo(params, jax.random.PRNGKey(i)))
        tls.append(time.perf_counter() - t0)
    per_step = (min(ths) - min(tls)) / (hi - lo)

    # reference recipe: 1,000 DDIM steps, CFG (2 U-Net fwds per step)
    samples_s_1000 = bs / (per_step * 1000)
    peak, kind = _peak()
    # per-CFG-step flops from XLA's own cost model by the hi/lo scan
    # difference; if the cost model doesn't scale with trip count, fall
    # back to the measured unlearn-step flops (= 2x(fwd+bwd) + 1 fwd
    # ~ 7 fwd-units at the same batch/config, so one CFG step = 2 units)
    if f_hi and f_lo and f_hi > f_lo:
        fwd_flops = (f_hi - f_lo) / (hi - lo)
    elif step_flops:
        fwd_flops = 2 * step_flops / 7.0
    else:
        fwd_flops = None
    mfu = fwd_flops / per_step / peak if fwd_flops else None
    _log({"metric": "ddpm_ddim_sampling", "ms_per_cfg_step": round(
              per_step * 1e3, 2),
          "samples_per_sec_at_1000steps": round(samples_s_1000, 2),
          "mfu_fwd": round(mfu, 4) if mfu else None, "device": kind,
          "batch": bs})


# -------------------------------------------------------------- mask gen


def bench_maskgen():
    _log({"phase": "maskgen_start"})
    from salun.core import accumulate_saliency_scanned, generate_masks
    from salun.core.mask import DEFAULT_THRESHOLDS
    from salun.core.train import cross_entropy
    from salun.models import create_model

    bs = 256
    n_forget = 4500  # Classification/README.md:23 recipe
    model = create_model("resnet18", num_classes=10)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 32, 32, 3)), train=False))(key)
    params, batch_stats = variables["params"], variables["batch_stats"]
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))

    rng = np.random.RandomState(0)
    n_batches = (n_forget + bs - 1) // bs
    aug_keys = jax.random.split(jax.random.PRNGKey(1), n_batches)
    batches = [
        {"image": rng.randint(0, 255, (bs, 32, 32, 3), np.uint8),
         "label": rng.randint(0, 10, (bs,), np.int32),
         "aug_key": aug_keys[i]}
        for i in range(n_batches)
    ]

    def grad_fn(p, batch):
        # mirrors cli/generate_mask.py::save_gradient_ratio: the reference
        # forget loader inherits the train transform, so saliency is
        # accumulated over augmented images
        from salun.data.loader import augment

        def loss(p):
            img = augment(batch["aug_key"],
                          batch["image"].astype(jnp.float32) / 255.0)
            out = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, train=False)
            return -cross_entropy(out, batch["label"])
        return jax.grad(loss)(p)

    import numpy as _np

    stacked = {k: jnp.asarray(_np.stack([b[k] for b in batches]))
               for k in batches[0]}
    # Warm up EVERYTHING the timed region dispatches, including the
    # trivial jnp.sum fetch expressions: the first use of even a tiny
    # reduce costs a full remote XLA compile through the axon tunnel
    # (~10 s) — r2's 10,453 ms "accumulation" was exactly that compile
    # landing inside the timed region (warmup used block_until_ready,
    # which silently no-ops here; see docs/BENCHMARKS.md).
    sal = accumulate_saliency_scanned(grad_fn, params, stacked)
    float(jnp.sum(jax.tree.leaves(sal)[0]))
    warm_masks = generate_masks(sal, DEFAULT_THRESHOLDS)
    float(jnp.sum(jax.tree.leaves(warm_masks[1.0])[0]))

    t_accs, t_sweeps = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        sal = accumulate_saliency_scanned(grad_fn, params, stacked)
        # scalar fetch forces execution (block_until_ready alone is not
        # trustworthy on the remote backend)
        float(jnp.sum(jax.tree.leaves(sal)[0]))
        t_accs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        masks = generate_masks(sal, DEFAULT_THRESHOLDS)
        # fetch (not block) a scalar from the LAST-dispatched threshold's
        # program — device execution is FIFO, so this forces the whole sweep
        float(jnp.sum(jax.tree.leaves(masks[1.0])[0]))
        t_sweeps.append(time.perf_counter() - t0)
    t_acc, t_sweep = min(t_accs), min(t_sweeps)

    # the reference's sweep, measured: double argsort over the 11M-element
    # concat per threshold (generate_mask.py:50-82) in torch on this host
    t_torch_sweep = None
    try:
        import torch

        g = {k: torch.tensor(np.asarray(v)) for k, v in
             enumerate_leaves(sal)}
        t0 = time.perf_counter()
        for thr in DEFAULT_THRESHOLDS:
            all_elements = -torch.cat([t.flatten() for t in g.values()])
            threshold_index = int(len(all_elements) * thr)
            positions = torch.argsort(all_elements)
            ranks = torch.argsort(positions)
            start = 0
            for k, tensor in g.items():
                n = tensor.numel()
                tr = ranks[start:start + n]
                tt = torch.zeros_like(tr)
                tt[tr < threshold_index] = 1
                tt.reshape(tensor.shape)
                start += n
        t_torch_sweep = time.perf_counter() - t0
    except Exception:
        pass

    _log({"metric": "maskgen_resnet18",
          "n_params": n_params,
          "saliency_accum_ms": round(t_acc * 1e3, 1),
          "threshold_sweep_ms": round(t_sweep * 1e3, 1),
          "total_ms": round((t_acc + t_sweep) * 1e3, 1),
          "torch_cpu_sweep_ms":
              round(t_torch_sweep * 1e3, 1) if t_torch_sweep else None,
          "sweep_speedup_vs_torch_cpu":
              round(t_torch_sweep / t_sweep, 2) if t_torch_sweep else None,
          "images_per_sec": round(n_forget / t_acc, 1)})
    return t_acc + t_sweep


def enumerate_leaves(tree):
    return list(enumerate(jax.tree.leaves(tree)))


# ----------------------------------------------------- north-star chain


def bench_salun_chain(maskgen_s):
    """The wall-clock the north-star names (BASELINE.md: 'mask-gen +
    unlearn epoch wall-clock, CIFAR-10 ResNet-18, ≥3× vs A100 on v5e-8'):
    saliency mask generation (bench_maskgen, timed separately and passed
    in) + the full 10-epoch SalUn-RL unlearn at the README recipe (4,500
    forget / 40,500 retain images, bs 256, lr 0.013, mask with_0.5 —
    Classification/README.md:34). Each epoch = one forget pass with fresh
    random labels (RL.py:109-176) + one retain pass; every pass is ONE
    dispatched lax.scan over its stacked batches.

    A100 baseline: same FLOPs-model as the DDPM headline (156 TFLOP/s TF32
    × 30% MFU — far above what eager fp32 torch reaches on CIFAR-size
    convs, so the baseline is generous). Mask-gen FLOPs are EXCLUDED from
    the baseline (its time is included in ours) — conservative in the
    baseline's favor. Per-chip number; the workload is data-parallel
    (mask-gen saliency is a psum, the unlearn step an all-reduce), so the
    v5e-8 figure is ~8× the per-chip ratio (dryrun_multichip validates
    the sharded program; see docs/BENCHMARKS.md)."""
    _log({"phase": "chain_start"})
    from salun.core import masked_opt, threshold_mask
    from salun.core.train import TrainState, make_train_step
    from salun.models import create_model

    bs = 256
    epochs = 10
    nf, nr = 4500 // bs, 40500 // bs  # 17 + 158 steps/epoch

    model = create_model("resnet18", num_classes=10, dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((bs, 32, 32, 3)), train=False))(jax.random.PRNGKey(0))

    @jax.jit
    def _mk(params):
        sal = jax.tree.map(
            lambda p: jnp.abs(jax.random.normal(
                jax.random.PRNGKey(1), p.shape)), params)
        return threshold_mask(sal, 0.5), jax.tree.map(jnp.copy, params)

    mask, theta0 = _mk(variables["params"])
    tx = masked_opt.masked_sgd_fused(0.013, 0.9, 5e-4, mask, theta0)
    state = TrainState.create(variables, tx)
    forget_step = make_train_step(model, tx, use_augment=True,
                                  random_labels=True, num_classes=10)
    retain_step = make_train_step(model, tx, use_augment=True,
                                  num_classes=10)

    rng = np.random.RandomState(0)

    def stacked(n):
        return {
            "image": jnp.asarray(
                rng.randint(0, 255, (n, bs, 32, 32, 3), np.uint8)),
            "label": jnp.asarray(rng.randint(0, 10, (n, bs), np.int32)),
            "weight": jnp.ones((n, bs), jnp.float32),
        }

    forget_x, retain_x = stacked(nf), stacked(nr)

    def make_epoch(step_fn, n):
        @jax.jit
        def run(state, xs, key):
            keys = jax.random.split(key, n)

            def body(st, x):
                batch, k = x
                st, m = step_fn(st, batch, k)
                return st, m["loss"]

            state, losses = jax.lax.scan(body, state, (xs, keys))
            return state, losses[-1]

        return run

    ef = make_epoch(forget_step, nf)
    er = make_epoch(retain_step, nr)
    key = jax.random.PRNGKey(0)
    cf, _ = _aot(ef, state, forget_x, key)
    cr, _ = _aot(er, state, retain_x, key)
    # XLA's cost model counts a lax.scan body ONCE regardless of trip
    # count, so per-step FLOPs come from single-step programs ×steps
    one = {k: v[0] for k, v in retain_x.items()}
    _, flops_step_f = _aot(forget_step, state, one, key)
    _, flops_step_r = _aot(retain_step, state, one, key)
    flops_f = flops_step_f * nf
    flops_r = flops_step_r * nr

    # warm both programs AND the scalar fetch
    state, l = cf(state, forget_x, jax.random.PRNGKey(1))
    state, l = cr(state, retain_x, jax.random.PRNGKey(2))
    float(l)

    t0 = time.perf_counter()
    for e in range(epochs):
        state, l = cf(state, forget_x, jax.random.PRNGKey(10 + e))
        state, l = cr(state, retain_x, jax.random.PRNGKey(100 + e))
    float(l)  # serial carry chain: the last fetch forces all 20 scans
    unlearn_s = time.perf_counter() - t0

    chain_s = (maskgen_s or 0.0) + unlearn_s
    flops_total = epochs * (flops_f + flops_r)
    baseline_s = (flops_total / (A100_TF32_PEAK * A100_ASSUMED_MFU)
                  if flops_total else None)
    vs = baseline_s / chain_s if baseline_s else None
    ips = epochs * (nf + nr) * bs / unlearn_s
    _log({"metric": "salun_maskgen_unlearn_chain",
          "maskgen_s": round(maskgen_s or 0.0, 3),
          "unlearn_10epoch_s": round(unlearn_s, 2),
          "chain_s": round(chain_s, 2),
          "unlearn_images_per_sec": round(ips, 1),
          "flops_total": flops_total,
          "a100_baseline_s": round(baseline_s, 2) if baseline_s else None,
          "vs_baseline_per_chip": round(vs, 3) if vs else None,
          "v5e8_projection": round(vs * 8, 1) if vs else None})
    return {
        "metric": "salun_maskgen_unlearn_chain_wallclock",
        "value": round(chain_s, 2),
        "unit": "s",
        "vs_baseline": round(vs, 3) if vs else 0.0,
    }


# ---------------------------------------------------- SD v1 real shape


def bench_sd():
    """The third workload at the true v1-inference shape — VERDICT r4
    #1/#2/#3.

    Three metrics (stderr):
    - ``sd_v1_random_label_step``: the composed step with strict per-step
      reference semantics — THREE VAE posterior encodes of 512² batches
      (remain + forget + the pseudo resample), three CLIP text encodes,
      three 859.5M-param U-Net passes at latent 64² (remain fwd+bwd,
      forget fwd+bwd, pseudo fwd), grad×saliency-mask, Adam — ONE jitted
      step, bf16 compute, block remat (the reference's own
      use_checkpoint: True).
    - ``sd_v1_random_label_step_cached``: the production cached-moments
      mode (trainers.make_random_label_step(cached="forget")): the
      deterministic frozen-stage recomputes collapse to posterior draws;
      numerics pinned equal by tests/test_sd.py.
    - ``sd_salun_chain``: the SD north-star — mask-gen over the Df-sized
      forget class + the 5-epoch recipe (SD/README.md:25: Adam 1e-5,
      α 0.5, mask 0.5; Df ≈ 952 Imagenette-class images = 4,760 unlearn
      image-steps + 119 mask batches), extrapolated PER IMAGE from
      steady-state measurements (every measured term is in the log line).

    Batch size: the recipe's bs 8 (random_label.py:236) does NOT fit one
    16 GB v5e with faithful f32 Adam semantics — the r5 HBM matrix
    (measured compile reports): bs 8 remat 21.8 GB, bs 4 remat 16.07 GB,
    bs 2 remat 13.7+2.9 GB = fits, vs the chip's 15.75 GB. At-recipe
    batches run sharded (cli --dp/--fsdp; dryrun-validated); this bench
    measures the largest faithful single-chip config (bs 2) and accounts
    the chain per image, stating so. The v5e-8 projection in the log is
    vs × 8 (the chain is data-parallel; per-chip bs 1 under FSDP).

    A100 baseline: as the DDPM headline — the reference runs eager fp32
    torch (no autocast anywhere), granted 30% MFU of the 156 TFLOP/s TF32
    peak on the UNCACHED step's XLA-counted FLOPs per image (the work the
    reference executes per image, including its own checkpointing
    recompute); mask-gen/precompute FLOPs are excluded from the baseline
    while their wall-clock is included in ours (conservative, baseline's
    favor). Timing: best-of-3 calls of a 3-iteration in-graph lax.scan
    with a carried data dependency (ADVICE r3)."""
    _log({"phase": "sd_start"})
    import optax

    from salun.core import threshold_mask
    from salun.sd import SDModules, SDUNetConfig, VAEConfig
    from salun.sd.clip_text import CLIPTextConfig
    from salun.sd.trainers import (
        make_cache_batch_fn, make_random_label_step, sd_generate_mask,
        with_mask,
    )

    B, DF, EPOCHS = 8, 952, 5           # recipe (random_label.py:236,239)
    MASK_BATCHES = DF // B              # 119 (generate_mask.py, 1 epoch)
    UNLEARN_IMAGES = EPOCHS * DF        # 4,760 forget image-steps
    B_STEP = 2  # largest faithful single-chip batch (HBM matrix above)

    # remat=True = the reference's own use_checkpoint: True training
    # config (v1-inference.yaml:43); without it the bs-8 recipe needs
    # 25.1 GB of HBM (measured r5) on a 15.75 GB chip
    modules = SDModules.create(SDUNetConfig(dtype=jnp.bfloat16, remat=True),
                               VAEConfig(dtype=jnp.bfloat16),
                               CLIPTextConfig(dtype=jnp.bfloat16),
                               num_timesteps=1000)
    params = modules.init(jax.random.PRNGKey(0), image_size=64)
    # HBM discipline (16 GB v5e): the step rebuilds dict(frozen,
    # unet=carry) itself, so there is exactly ONE U-Net on device — the
    # trainee, threaded from config to config (timing doesn't care that
    # its values drift). r3/r4 kept a pristine copy on the HOST instead,
    # and the 3.44 GB device_get+device_put roundtrip through the tunnel
    # cost ~560 s (BENCH_r03.json sd_start→sd_aot_start). Persistent
    # device footprint while stepping: carry 3.44 + Adam moments 6.88 +
    # VAE/CLIP 0.83 + bf16 mask 1.72 ≈ 12.9 GB.
    # frozen stages stored bf16: inference-only and already COMPUTED in
    # bf16 (cfg.dtype); f32 storage wastes 413 MB of the 15.75 GB budget
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          {"vae": params["vae"], "clip": params["clip"]})
    unet_live = [params["unet"]]  # single-slot box threaded through runs
    del params

    @jax.jit
    def _mk_mask(unet_params):
        sal = jax.tree.map(
            lambda p: jnp.abs(jax.random.normal(
                jax.random.PRNGKey(1), p.shape)), unet_params)
        # int8 mask: 0/1 values are exact (mask_grads casts at use) and
        # the 860M-entry mask drops from 3.4 GB f32 to 0.86 GB
        return jax.tree.map(lambda m: m.astype(jnp.int8),
                            threshold_mask(sal, 0.5))

    rng = np.random.RandomState(0)
    peak, kind = _peak()
    iters = 3

    def make_batch(b):
        return {
            "forget_images": jnp.asarray(
                rng.rand(b, 512, 512, 3).astype(np.float32) * 2 - 1),
            "remain_images": jnp.asarray(
                rng.rand(b, 512, 512, 3).astype(np.float32) * 2 - 1),
            "forget_ids": jnp.asarray(rng.randint(0, 49408, (b, 77))),
            "pseudo_ids": jnp.asarray(rng.randint(0, 49408, (b, 77))),
            "remain_ids": jnp.asarray(rng.randint(0, 49408, (b, 77))),
        }

    def run_cfg(b, use_mask, cached):
        """Returns (best_s_per_step, flops_per_step, extra_cache_s)."""
        unet0 = unet_live.pop()
        mask = _mk_mask(unet0) if use_mask else None
        tx = with_mask(optax.adam(1e-5), mask)
        carry = (unet0, tx.init(unet0))
        del unet0
        step = make_random_label_step(modules, tx, alpha=0.5,
                                      cached=cached or False)
        batch = make_batch(b)
        cache_s = None
        if cached:
            cache_fn = make_cache_batch_fn(modules, cached)
            batch = cache_fn(frozen, batch)          # compile + first call
            float(jnp.sum(jax.tree.leaves(batch)[0].astype(jnp.float32)))
            t0 = time.perf_counter()
            batch = cache_fn(frozen, make_batch(b))  # steady-state
            float(jnp.sum(jax.tree.leaves(batch)[0].astype(jnp.float32)))
            cache_s = time.perf_counter() - t0

        # donate the carry: 859.5M params + Adam moments must update
        # in place, or the un-donated copy alone overflows HBM.
        # ``frozen`` MUST be an argument, not a closure: closure-captured
        # device arrays embed as HLO literals, and 0.83 GB of VAE/CLIP
        # literals overflows the remote-compile request (HTTP 413 —
        # measured r5; the tpu_bench docstring rule).
        @partial(jax.jit, donate_argnums=0)
        def run(carry, frozen, batch, key):
            def body(c, k):
                c, loss = step(c, frozen, batch, k)
                return c, loss

            carry, losses = jax.lax.scan(body, carry,
                                         jax.random.split(key, iters))
            return carry, losses[-1]

        _log({"phase": f"sd_aot_b{b}_mask{int(use_mask)}_"
                       f"cached{cached or 0}"})
        crun, flops = _aot(run, carry, frozen, batch, jax.random.PRNGKey(1))
        carry, loss = crun(carry, frozen, batch,
                           jax.random.PRNGKey(2))  # warm
        float(loss)
        best = None
        for rep in range(3):                       # best-of-3 (ADVICE r3)
            t0 = time.perf_counter()
            carry, loss = crun(carry, frozen, batch,
                               jax.random.PRNGKey(3 + rep))
            float(loss)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        unet_live.append(carry[0])  # hand the trainee to the next config
        del carry
        flops_step = flops / iters if flops else 0.0
        baseline_s = (flops_step / (A100_TF32_PEAK * A100_ASSUMED_MFU)
                      if flops_step else None)
        vs = baseline_s / best if baseline_s else None
        _log({"metric": ("sd_v1_random_label_step_cached" if cached
                         else "sd_v1_random_label_step"),
              "ms_per_step": round(best * 1e3, 1),
              "images_per_sec": round(b / best, 2),
              "flops_per_step": flops_step,
              "mfu": round(flops_step / best / peak, 4) if flops_step
              else None,
              "vs_a100_baseline": round(vs, 3) if vs else None,
              "device": kind, "batch": b, "masked": use_mask,
              **({"cache_batch_s": round(cache_s, 3)} if cache_s else {})})
        return best, flops_step, cache_s

    def _ensure_live():
        """A failed (donated) run loses the trainee; re-init on device."""
        if not unet_live:
            unet_live.append(
                modules.init(jax.random.PRNGKey(0), image_size=64)["unet"])

    # ---- step, uncached (strict reference semantics). Ladder starts at
    # the MEASURED largest faithful single-chip config — bs 4/8 are known
    # OOM (HBM matrix in the docstring), so no compile time is burned
    # rediscovering that.
    step_unc = flops_unc = None
    for b, use_mask in ((B_STEP, True), (1, True), (1, False)):
        try:
            step_unc, flops_unc, _ = run_cfg(b, use_mask, False)
            b_used, masked_used = b, use_mask
            break
        except Exception as e:
            _log({"sd_bench_oom_or_error": repr(e), "batch": b,
                  "masked": use_mask})
            _ensure_live()
    if step_unc is None:
        return None

    # ---- step, cached-moments production mode
    step_c = cache_s = None
    if not _over_budget("sd_cached_step"):
        try:
            step_c, _, cache_s = run_cfg(b_used, masked_used, "forget")
        except Exception as e:
            _log({"sd_cached_error": repr(e)})
            _ensure_live()

    vs_step = (flops_unc / (A100_TF32_PEAK * A100_ASSUMED_MFU)
               / step_unc if flops_unc else None)

    # ---- mask-gen per-batch slope (sd_generate_mask runs the real
    # accumulation program + the 860M-param threshold sweep; two sizes
    # cancel the shared one-time costs out of the per-batch term)
    if _over_budget("sd_chain", margin_s=400.0):
        return vs_step
    mask_s_119 = None
    try:
        imgs = (rng.rand(48, 512, 512, 3).astype(np.float32) * 2 - 1)
        # synthetic token ids: the real CLIP BPE is asset-gated
        # (zero-egress); ids bypass the tokenizer without changing the
        # measured programs
        ids = rng.randint(0, 49408, (48, 77))
        nul = rng.randint(0, 49408, (48, 77))
        key = jax.random.PRNGKey(5)
        _ensure_live()
        params_full = dict(frozen, unet=unet_live[-1])

        def mg(n):
            sd_generate_mask(modules, params_full, imgs[:n], None, key,
                             batch_size=B, prompt_ids=ids[:n],
                             null_ids=nul[:n])

        mg(16)                                             # warm programs
        t0 = time.perf_counter()
        mg(16)
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        mg(48)
        t6 = time.perf_counter() - t0
        per_batch = max((t6 - t2) / 4.0, 0.0)
        overhead = max(t2 - 2 * per_batch, 0.0)   # threshold sweep etc.
        mask_s_119 = overhead + MASK_BATCHES * per_batch
        _log({"sd_maskgen_slope": {"t2_batches_s": round(t2, 2),
                                   "t6_batches_s": round(t6, 2),
                                   "per_batch_s": round(per_batch, 3),
                                   "overhead_s": round(overhead, 2)}})
    except Exception as e:
        _log({"sd_maskgen_error": repr(e)})

    # ---- the chain: precompute + mask-gen + 5-epoch unlearn, accounted
    # PER IMAGE (the recipe is 4,760 forget image-steps; steps run at the
    # measured faithful batch b_used)
    if mask_s_119 is None or step_c is None:
        return vs_step
    n_steps = UNLEARN_IMAGES // b_used
    # moment-precompute measured at the production batch size 8 (VAE
    # fwd-only fits bs 8 comfortably); 6 back-to-back calls with one
    # final fetch amortize the per-dispatch tunnel round trip the way a
    # real precompute loop does (FIFO device queue)
    n_pre = MASK_BATCHES
    try:
        cache8 = make_cache_batch_fn(modules, "forget")
        _ensure_live()
        b8 = make_batch(B)
        out = cache8(frozen, b8)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(6):
            out = cache8(frozen, b8)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        pre_s = (time.perf_counter() - t0) / 6 * n_pre
    except Exception as e:
        _log({"sd_cache8_error": repr(e)})
        n_pre = DF // b_used
        pre_s = (cache_s or 0.0) * n_pre
    unlearn_s = step_c * n_steps
    chain_s = pre_s + mask_s_119 + unlearn_s
    # baseline per image = uncached-step FLOPs / b_used (the reference
    # does the same per-image work incl. its checkpointing recompute)
    baseline_s = (flops_unc / b_used * UNLEARN_IMAGES
                  / (A100_TF32_PEAK * A100_ASSUMED_MFU))
    vs = baseline_s / chain_s
    _log({"metric": "sd_salun_chain",
          "precompute_s": round(pre_s, 2),
          "maskgen_s": round(mask_s_119, 2),
          "unlearn_s": round(unlearn_s, 2),
          "chain_s": round(chain_s, 2),
          "unlearn_images": UNLEARN_IMAGES,
          "step_batch": b_used,
          "flops_per_image_uncached": flops_unc / b_used,
          "a100_baseline_s": round(baseline_s, 2),
          "vs_baseline_per_chip": round(vs, 3),
          "v5e8_projection": round(vs * 8, 2),
          "device": kind,
          "derivation": f"Df={DF}, 5 epochs = {UNLEARN_IMAGES} image-"
                        f"steps at bs {b_used} ({n_steps} steps x "
                        f"{round((step_c or 0) * 1e3, 1)} ms, cached-"
                        f"moment mode) + {MASK_BATCHES} mask batches at "
                        f"bs {B} (slope-extrapolated) + {n_pre} moment-"
                        "precompute batches (bs 8, amortized); baseline "
                        "= uncached per-"
                        "image FLOPs x 4760 / (156e12 x 0.30); mask-gen+"
                        "precompute excluded from baseline. v5e8_"
                        "projection = vs x 8 (data-parallel chain; "
                        "at-recipe bs runs sharded via --dp/--fsdp)"})
    return vs


# ------------------------------------------------- classification RL step


def bench_resnet_rl():
    _log({"phase": "rl_start"})
    from salun.core import masked_opt, threshold_mask
    from salun.core.train import TrainState, make_train_step
    from salun.models import create_model

    batch = 256
    model = create_model("resnet18", num_classes=10, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((batch, 32, 32, 3)), train=False))(key)

    @jax.jit
    def _mk(params):
        sal = jax.tree.map(
            lambda p: jnp.abs(jax.random.normal(
                jax.random.PRNGKey(1), p.shape)), params)
        return threshold_mask(sal, 0.5), jax.tree.map(jnp.copy, params)

    mask, theta0 = _mk(variables["params"])
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
    _log({"phase": "rl_aot_start"})
    step_c, flops = _aot(step, state, data, key)
    _log({"phase": "rl_aot_done"})

    for i in range(3):
        state, m = step_c(state, data, jax.random.PRNGKey(i))
    float(m["loss"])  # scalar fetch (see DDPM section)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_c(state, data, jax.random.PRNGKey(100 + i))
    float(m["loss"])
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    peak, kind = _peak()
    mfu = flops * iters / dt / peak if flops else None
    _log({"metric": "salun_rl_masked_unlearn_throughput",
          "images_per_sec": round(ips, 1),
          "flops_per_step": flops,
          "mfu": round(mfu, 4) if mfu else None, "device": kind})


def _arm_watchdog():
    """Guarantee ONE stdout JSON line even if the axon tunnel hangs.

    `import jax` succeeds during outages but the first device touch
    (jax.devices()) can block for hours (observed; see
    docs/BENCHMARKS.md timing notes). The driver records bench stdout —
    a hang would leave it with nothing, so after SALUN_BENCH_WATCHDOG_S
    (default 3000 s; a cold-cache run measured 1460 s) a daemon timer
    prints a controlled error headline and hard-exits."""
    import os
    import threading

    limit = float(os.environ.get("SALUN_BENCH_WATCHDOG_S", "3000"))
    done = threading.Event()

    def fire():
        if done.is_set():  # headline already printed; don't double-print
            return
        print(json.dumps({
            "metric": "salun_maskgen_unlearn_chain_wallclock",
            "value": 0, "unit": "s", "vs_baseline": 0.0,
            "error": f"watchdog: no result within {limit:.0f}s "
                     "(TPU tunnel hang — rerun when the tunnel recovers)",
        }), flush=True)
        os._exit(0)

    t = threading.Timer(limit, fire)
    t.daemon = True
    t.start()
    return t, done


# Elapsed-time budget (VERDICT r4 #1: r4's bench exceeded the ~1800 s
# driver allowance and was killed mid-secondary with rc=124, leaving the
# artifact's parsed field on a stderr phase line). Two layers of defense:
#   - cooperative: _over_budget() is checked before every secondary (soft
#     margin keeps a compile from straddling the deadline);
#   - hard: after the headline is measured, a daemon timer re-prints the
#     headline as the FINAL stdout line and exits 0 at the deadline, so a
#     straddling compile can never produce rc=124 again.
BUDGET_S = None  # set in main() from SALUN_BENCH_BUDGET_S (default 1650)


def _over_budget(label: str, margin_s: float = 250.0) -> bool:
    el = time.perf_counter() - _T0
    if BUDGET_S is not None and el > BUDGET_S - margin_s:
        _log({"skipped": label, "elapsed_s": round(el, 1),
              "budget_s": BUDGET_S})
        return True
    return False


def _arm_deadline(headline: dict):
    """Hard exit at the budget: re-print the headline (the driver parses
    the final JSON line of the combined stream) and exit 0."""
    import os
    import threading

    remaining = BUDGET_S - (time.perf_counter() - _T0)

    def fire():
        _log({"deadline": "budget reached mid-secondary; exiting clean"})
        print(json.dumps(headline), flush=True)
        os._exit(0)

    if remaining <= 0:
        fire()
    t = threading.Timer(remaining, fire)
    t.daemon = True
    t.start()
    return t


def main():
    # Headline = the north-star chain (mask-gen + 10-epoch SalUn-RL
    # unlearn wall-clock, BASELINE.md); run first — tunnel throughput
    # degrades after back-to-back heavy runs (docs/BENCHMARKS.md).
    import os

    global BUDGET_S
    # default sized against the driver's observed ~1800 s kill (r4 rc=124
    # at t=1794.7): leave ~60 s of slack for the deadline re-print
    BUDGET_S = float(os.environ.get("SALUN_BENCH_BUDGET_S", "1740"))
    watchdog, done = _arm_watchdog()
    headline = None
    ddpm = None
    try:
        maskgen_s = bench_maskgen()
        headline = bench_salun_chain(maskgen_s)
    except Exception as e:
        _log({"chain_bench_error": repr(e)})
    if headline is None:  # fallback headline: the DDPM flagship step
        try:
            ddpm = bench_ddpm_salun_step()
            headline = dict(ddpm)
        except Exception as e:
            _log({"fallback_bench_error": repr(e)})
    if headline is None:  # both benches failed: controlled error line
        headline = {"metric": "salun_maskgen_unlearn_chain_wallclock",
                    "value": 0, "unit": "s", "vs_baseline": 0.0,
                    "error": "all benches failed; see stderr"}
    # Print the headline BEFORE the secondary benches: a degraded tunnel
    # slowing the secondaries past the watchdog must not discard an
    # already-measured result.
    done.set()
    watchdog.cancel()
    headline = dict(headline)
    headline.pop("_flops", None)
    print(json.dumps(headline), flush=True)
    deadline = _arm_deadline(headline)

    # Secondaries (stderr only), highest-value first — SD before the DDPM
    # chain (VERDICT r4 #1b: SD had zero at-recipe data; the DDPM chain
    # already has an r4 number). Each runs in its own try/except so one
    # failure can't starve the rest.
    def secondary(label, fn, margin_s=250.0):
        if _over_budget(label, margin_s=margin_s):
            return None
        try:
            return fn()
        except Exception as e:
            _log({f"{label}_error": repr(e)})
            return None

    secondary("sd", bench_sd)
    # the corrected DDPM chain ranks above the stable step/sampling
    # metrics (r4's chain number carried the warmup-accounting bug);
    # ~230 s warm-cache, hence the tighter margin
    secondary("ddpm_chain", bench_ddpm_chain, margin_s=170.0)
    ddpm = ddpm or secondary("ddpm_step", bench_ddpm_salun_step)
    secondary("ddpm_sampling", lambda: bench_ddpm_sampling(
        step_flops=ddpm.get("_flops") if ddpm else None))
    secondary("resnet_rl", bench_resnet_rl)
    deadline.cancel()
    # Re-print the headline LAST: the driver's artifact parses the final
    # JSON line of the combined stream (BENCH_r03.json's "parsed" field
    # captured a stderr secondary instead of the headline).
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
