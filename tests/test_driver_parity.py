"""Driver-level end-to-end golden parity vs the reference's OWN drivers.

The architecture tests (test_arch_parity.py) pin the models and the
optimizer-level golden tests (test_reference_parity.py) pin the SalUn
update chain; here the reference's *actual driver code* — the
``iterative_unlearn`` decorator (Classification/unlearn/impl.py:54-127:
SGD construction, MultiStepLR stepped per epoch, epoch loop) wrapped
around the real ``unlearn/RL.py`` — runs verbatim from /root/reference
on a tiny synthetic setting, while a forward hook + recording criterion
capture the exact (image, label) stream it consumes (this covers the
random relabeling, loader order, and the cifar100 relabel+concat+shuffle
regime without having to mirror torch RNG) plus a post-step snapshot of
params/BN-stats/momentum. Each captured step is then replayed through
this framework's production pieces (``make_train_step`` +
``masked_sgd_fused`` + ``multistep_lr``) with per-step state resync —
see ``_replay_stepwise`` for why resync (fp32 chaos) — and every step's
parameters, momentum, pinned coordinates, and BN running stats must
match at ~fp32 exactness. This harness is what caught the
biased-vs-Bessel running-var mismatch fixed in
``salun/models/layers.py::TorchBatchNorm``.

Reference-code accommodations (behavior-preserving): ``.cuda()`` no-ops
(no GPU here), torchvision/lmdb import stubs (packages absent — only
referenced at import time by modules this test never calls), and the
reference's own latent ImportError (`trainer/__init__.py:1` imports a
``train_with_rewind`` that does not exist in `trainer/train.py`) patched
with a stub so the package loads — exactly the gap SURVEY.md §2.1 notes.
"""

import importlib.machinery
import importlib.util
import sys
import types
from types import SimpleNamespace as NS

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

CLS_REF = "/root/reference/Classification"


@pytest.fixture(scope="module")
def ref_unlearn():
    """Import the reference's real `unlearn` package (with the minimal
    stubs described in the module docstring); restore patched torch
    attributes afterwards."""
    saved_cuda = (torch.Tensor.cuda, torch.nn.Module.cuda)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # Other reference roots (DDPM/SD, pushed by test_arch_parity) must not
    # shadow imports during this fixture: DDPM also ships top-level
    # ``models`` and ``datasets`` packages, and e.g. `import datasets`
    # (reached via Classification/imagenet.py) must resolve to the HF
    # library, not DDPM/datasets (which needs real torchvision).
    parked = [p for p in sys.path
              if p.startswith("/root/reference") and p != CLS_REF]
    for p in parked:
        sys.path.remove(p)
    if CLS_REF in sys.path:
        sys.path.remove(CLS_REF)
    sys.path.insert(0, CLS_REF)
    for name, mod in list(sys.modules.items()):
        f = getattr(mod, "__file__", None) or ""
        stale_models = (name == "models" or name.startswith("models.")) \
            and not f.startswith(CLS_REF)
        stale_ref = f.startswith("/root/reference") \
            and not f.startswith(CLS_REF)
        if stale_models or stale_ref:
            del sys.modules[name]

    class _Stub(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)

            class Dummy:
                def __init__(self, *a, **k):
                    pass

                def __call__(self, *a, **k):
                    return a[0] if a else None

            Dummy.__name__ = name
            return Dummy

    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.datasets", "torchvision.models", "lmdb"):
        if name not in sys.modules:
            m = _Stub(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = m

    if "trainer" not in sys.modules:
        pkg = types.ModuleType("trainer")
        sys.modules["trainer"] = pkg
        for fname in ("train", "val"):
            spec = importlib.util.spec_from_file_location(
                f"trainer.{fname}", f"{CLS_REF}/trainer/{fname}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"trainer.{fname}"] = mod
            spec.loader.exec_module(mod)
            for k in dir(mod):
                if not k.startswith("_"):
                    setattr(pkg, k, getattr(mod, k))
        if not hasattr(pkg, "train_with_rewind"):
            pkg.train_with_rewind = lambda *a, **k: None

    import unlearn as ref_unlearn_pkg

    yield ref_unlearn_pkg
    torch.Tensor.cuda, torch.nn.Module.cuda = saved_cuda
    sys.path.extend(parked)


class _Loader:
    """Minimal loader: iterable of (image, target) with the `.dataset`
    attribute the reference drivers touch."""

    def __init__(self, batches, dataset=None):
        self.batches = batches
        self.dataset = dataset if dataset is not None else []

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


class _TinyDataset(torch.utils.data.Dataset):
    def __init__(self, images, targets):
        self.images = images
        self.targets = np.asarray(targets)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i], int(self.targets[i])


def _args(C, epochs=3, lr=0.05, dataset="cifar10"):
    return NS(dataset=dataset, num_classes=C, unlearn="RL",
              unlearn_lr=lr, momentum=0.9, weight_decay=5e-4,
              unlearn_epochs=epochs, decreasing_lr="2", rewind_epoch=0,
              imagenet_arch=False, warmup=0, print_freq=10**9,
              batch_size=8, no_l1_epochs=0, alpha=5e-4)


def _capture_run(ref_unlearn, tm, data_loaders, args, mask_t):
    """Run the reference driver, capturing the exact consumed batches plus
    a post-step snapshot (state_dict + SGD momentum buffers) after every
    ``_restore_masked_params`` — i.e. after the full reference update:
    grad·mask → SGD step → θ₀ restore → momentum zeroing."""
    records = []

    def hook(_m, inp, _out):
        records.append({"image": inp[0].detach().clone()})

    class RecordingCE(torch.nn.Module):
        def forward(self, out, target):
            records[-1]["label"] = target.detach().clone()
            return torch.nn.functional.cross_entropy(out, target)

    ref_rl_mod = sys.modules["unlearn.RL"]
    orig_restore = ref_rl_mod._restore_masked_params

    def restore_and_snap(model, mask, theta0, optimizer):
        orig_restore(model, mask, theta0, optimizer)
        mom = {}
        for name, p in model.named_parameters():
            st = optimizer.state.get(p)
            mom[name] = (st["momentum_buffer"].detach().clone()
                         if st and "momentum_buffer" in st
                         else torch.zeros_like(p))
        records[-1]["sd"] = {k: v.detach().clone()
                             for k, v in model.state_dict().items()}
        records[-1]["mom"] = mom

    ref_rl_mod._restore_masked_params = restore_and_snap
    h = tm.register_forward_hook(hook)
    try:
        ref_unlearn.get_unlearn_method("RL")(
            data_loaders, tm, RecordingCE(), args, mask=mask_t)
    finally:
        h.remove()
        ref_rl_mod._restore_masked_params = orig_restore
    return records


def _replay_stepwise(init_sd, mask_t, records, args, steps_per_epoch):
    """Per-step resynced replay: before each step, load the reference's
    post-previous-step snapshot (params, BN stats, momentum buffers), run
    ONE production step, and compare against the reference's post-step
    snapshot at near-fp32-exactness.

    Resyncing each step is what makes the comparison rigorous: a free
    40-step run through a conv+BN net is chaotic in fp32 (measured ~2×
    amplification per step of the per-step noise, i.e. ~0.04 final drift
    with NO semantic difference), which would force a tolerance so loose
    it could hide real bugs — e.g. the biased-vs-Bessel running-var
    update this test caught.

    Tolerances are calibrated to torch's own fp32 backward noise: torch
    f32 grads differ from a torch f64 oracle by up to ~1e-3 on deep-layer
    conv kernels (BN-backward cancellation; measured 9.3e-4 on
    layer2_1.conv2 at this exact setting — identical, to the displayed
    digit, to the jax-vs-torch f32 gap, i.e. our grads sit on the f64
    oracle and the entire gap is torch's reduction-order noise). So:
    momentum (≈ raw grad) 2e-3 abs, params (lr·grad) 2e-4 abs, BN
    running stats (forward-only, no cancellation) tight at 2e-5 — the
    Bessel bug shows up at ~1e-3 there, momentum-zeroing bugs at ~1e-1,
    LR-schedule bugs at ~1e-2, all well above these floors."""
    from salun import ckpt
    from salun.core import masked_opt
    from salun.core.masked_opt import FusedMaskedSGDState
    from salun.core.train import TrainState, make_train_step, multistep_lr
    from salun.models import create_model
    from salun.utils.tree import flatten_names

    C = args.num_classes
    model = create_model("resnet20s", num_classes=C)
    params0, stats0 = ckpt.import_resnet(init_sd, num_classes=C)
    mask_tree = ckpt.import_mask(mask_t, params0)
    theta0 = jax.tree.map(jnp.copy, params0)
    masks_flat = flatten_names(mask_tree)
    t0_flat = flatten_names(theta0)
    sched = multistep_lr(args.unlearn_lr,
                         [int(m) for m in args.decreasing_lr.split(",")],
                         steps_per_epoch)
    tx = masked_opt.masked_sgd_fused(sched, args.momentum,
                                     args.weight_decay, mask_tree, theta0)
    template = tx.init(params0)
    step = make_train_step(model, tx, use_augment=False, num_classes=C)
    key = jax.random.PRNGKey(0)  # unused: no augment, labels explicit

    params, stats = params0, stats0
    trace = jax.tree.map(jnp.zeros_like, params0)
    for i, rec in enumerate(records):
        # fresh copies every step: the jitted step donates its input state,
        # which would free the template's mask/theta0 buffers after step 0
        opt_state = FusedMaskedSGDState(
            trace=trace, count=jnp.asarray(i, jnp.int32),
            mask=jax.tree.map(jnp.copy, template.mask),
            theta0=jax.tree.map(jnp.copy, template.theta0))
        state = TrainState(
            params=params, batch_stats=stats, opt_state=opt_state,
            step=jnp.asarray(i, jnp.int32))
        batch = {
            "image": jnp.asarray(
                rec["image"].numpy().transpose(0, 2, 3, 1)),
            "label": jnp.asarray(rec["label"].numpy().astype(np.int32)),
        }
        state, _ = step(state, batch, key)

        want_p, want_s = ckpt.import_resnet(rec["sd"], num_classes=C)
        want_m = ckpt.import_mask(rec["mom"], params0)
        got_p, got_s = flatten_names(state.params), flatten_names(
            state.batch_stats)
        got_m = flatten_names(state.opt_state.trace)
        w_p, w_s = flatten_names(want_p), flatten_names(want_s)
        w_m = flatten_names(want_m)
        assert set(got_p) == set(w_p)
        for k in w_p:
            np.testing.assert_allclose(
                np.asarray(got_p[k]), np.asarray(w_p[k]), rtol=1e-3,
                atol=2e-4, err_msg=f"step {i} param {k}")
            off = np.asarray(masks_flat[k]) == 0
            np.testing.assert_array_equal(
                np.asarray(got_p[k])[off], np.asarray(t0_flat[k])[off],
                err_msg=f"step {i} pinned coords moved: {k}")
            np.testing.assert_allclose(
                np.asarray(got_m[k]), np.asarray(w_m[k]), rtol=5e-3,
                atol=2e-3, err_msg=f"step {i} momentum {k}")
        for k in w_s:
            np.testing.assert_allclose(
                np.asarray(got_s[k]), np.asarray(w_s[k]), rtol=1e-4,
                atol=2e-5, err_msg=f"step {i} batch stat {k}")

        # resync: next step starts from the reference's exact state
        params, stats, trace = want_p, want_s, want_m


def _build_torch_model(rng, C):
    from models.ResNets import resnet20s

    torch.manual_seed(0)
    tm = resnet20s(C)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.tensor(
                    rng.standard_normal(m.running_mean.shape) * 0.3,
                    dtype=torch.float32))
                m.running_var.copy_(torch.tensor(
                    0.5 + rng.random(m.running_var.shape),
                    dtype=torch.float32))
    mask_t = {name: torch.tensor(
        (rng.random(tuple(p.shape)) < 0.5).astype(np.float32))
        for name, p in tm.named_parameters()}
    return tm, mask_t


def test_reference_rl_driver_cifar10_regime(rng, ref_unlearn):
    """cifar10/svhn regime (RL.py:109-176): forget pass with fresh random
    labels then retain pass, per epoch, through the real decorator."""
    C, bs, nf, nr = 4, 8, 2, 3
    tm, mask_t = _build_torch_model(rng, C)
    init_sd = {k: v.clone() for k, v in tm.state_dict().items()}

    def batches(n, seed):
        g = np.random.default_rng(seed)
        return [(torch.tensor(g.random((bs, 3, 32, 32)).astype(np.float32)),
                 torch.tensor(g.integers(0, C, (bs,)))) for _ in range(n)]

    loaders = {"forget": _Loader(batches(nf, 1)),
               "retain": _Loader(batches(nr, 2))}
    args = _args(C)
    torch.manual_seed(7)  # the random relabel stream
    records = _capture_run(ref_unlearn, tm, loaders, args, mask_t)
    assert len(records) == args.unlearn_epochs * (nf + nr)

    _replay_stepwise(init_sd, mask_t, records, args,
                     steps_per_epoch=nf + nr)


def test_reference_rl_driver_cifar100_regime(rng, ref_unlearn):
    """cifar100/TinyImagenet regime (RL.py:51-107): the driver relabels
    the forget dataset in place (np.random), concats with retain, and
    iterates ONE shuffled DataLoader per epoch — shuffle order and labels
    come from the reference's own RNG use and are captured, not
    mirrored."""
    C, bs, nf, nr = 4, 8, 16, 24
    tm, mask_t = _build_torch_model(rng, C)
    init_sd = {k: v.clone() for k, v in tm.state_dict().items()}

    g = np.random.default_rng(3)
    f_imgs = [torch.tensor(g.random((3, 32, 32)).astype(np.float32))
              for _ in range(nf)]
    r_imgs = [torch.tensor(g.random((3, 32, 32)).astype(np.float32))
              for _ in range(nr)]
    forget_ds = _TinyDataset(f_imgs, g.integers(0, C, (nf,)))
    retain_ds = _TinyDataset(r_imgs, g.integers(0, C, (nr,)))
    loaders = {"forget": _Loader([], dataset=forget_ds),
               "retain": _Loader([], dataset=retain_ds)}
    args = _args(C, dataset="cifar100")
    torch.manual_seed(11)
    np.random.seed(13)
    records = _capture_run(ref_unlearn, tm, loaders, args, mask_t)
    steps_per_epoch = -(-(nf + nr) // bs)
    assert len(records) == args.unlearn_epochs * steps_per_epoch

    _replay_stepwise(init_sd, mask_t, records, args,
                     steps_per_epoch=steps_per_epoch)
