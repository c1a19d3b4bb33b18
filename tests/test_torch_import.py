"""Golden-parity of the torch importers: a torch CIFAR ResNet-18 and our
flax ResNet-18 must produce the same logits after weight import."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from salun.ckpt import import_mask, export_mask, import_resnet  # noqa: E402
from salun.models import create_model  # noqa: E402


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idt)


class TorchResNet18(nn.Module):
    """Standard torchvision-style CIFAR ResNet-18 (stem 3x3/s1)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cins = [64, 64, 128, 256]
        couts = [64, 128, 256, 512]
        for i in range(4):
            stride = 1 if i == 0 else 2
            blocks = nn.ModuleList([
                TorchBasicBlock(cins[i], couts[i], stride),
                TorchBasicBlock(couts[i], couts[i], 1),
            ])
            setattr(self, f"layer{i + 1}", blocks)
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        for i in range(4):
            for blk in getattr(self, f"layer{i + 1}"):
                x = blk(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _torch_style_state_dict(model):
    # ModuleList yields names layer1.0.conv1.weight etc. — same as torchvision
    return {k: v for k, v in model.state_dict().items()}


def test_resnet18_forward_parity():
    tm = TorchResNet18().eval()
    sd = _torch_style_state_dict(tm)
    params, stats = import_resnet(sd, num_classes=10)

    model = create_model("resnet18", num_classes=10, normalize_input=False)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_mask_import_layout():
    """A reference-format mask dict (torch names, OIHW) lands on the right
    leaves with the right layout; unmentioned leaves default to ones."""
    model = create_model("resnet18", num_classes=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=False)
    rng = np.random.RandomState(0)
    conv_mask = (rng.rand(64, 3, 3, 3) > 0.5).astype(np.float32)  # OIHW
    fc_mask = (rng.rand(10, 512) > 0.5).astype(np.float32)        # [out,in]
    torch_dict = {
        "conv1.weight": torch.tensor(conv_mask),
        "fc.weight": torch.tensor(fc_mask),
        "fc.bias": torch.tensor(np.zeros(10, np.float32)),
    }
    tree = import_mask(torch_dict, v["params"])
    np.testing.assert_array_equal(
        np.asarray(tree["conv1"]["kernel"]), conv_mask.transpose(2, 3, 1, 0)
    )
    np.testing.assert_array_equal(np.asarray(tree["fc"]["kernel"]), fc_mask.T)
    np.testing.assert_array_equal(np.asarray(tree["fc"]["bias"]), 0.0)
    # untouched leaf defaults to ones
    assert float(tree["bn1"]["scale"].min()) == 1.0


def test_ddpm_unet_export_import_roundtrip():
    """export_ddpm_unet is the exact inverse of import_ddpm_unet: a tiny
    ConditionalUNet params tree survives the torch-name/layout roundtrip
    bit-for-bit (the writer the preflight rehearsal uses to synthesize
    reference-format DDPM checkpoints, runners/diffusion.py:252-265)."""
    from salun.ckpt import export_ddpm_unet, import_ddpm_unet
    from salun.diffusion import ConditionalUNet, UNetConfig

    cfg = UNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(4,), image_size=8, dropout=0.0)
    model = ConditionalUNet(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32), train=False, cond_drop_prob=0.0,
    )["params"]
    sd = export_ddpm_unet(params)
    back = import_ddpm_unet(sd, params)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(back), key=lambda kv: str(kv[0]))):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(ka))


def test_resnet_export_import_roundtrip():
    """export_resnet → import_resnet reproduces the flax trees bit-for-bit
    (the writer the preflight rehearsal uses to synthesize
    torchvision-format classifier stand-ins for cli/sd_eval imageclassify
    and cli/ddpm_classifier eval)."""
    from salun.ckpt import export_resnet

    model = create_model("resnet18", num_classes=10)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    params, stats = variables["params"], variables["batch_stats"]
    sd = {k: torch.tensor(v) for k, v in export_resnet(params, stats).items()}
    back_p, back_s = import_resnet(sd)
    for tree, back in ((params, back_p), (stats, back_s)):
        pa = sorted(jax.tree_util.tree_leaves_with_path(tree),
                    key=lambda kv: str(kv[0]))
        pb = sorted(jax.tree_util.tree_leaves_with_path(back),
                    key=lambda kv: str(kv[0]))
        assert [str(k) for k, _ in pa] == [str(k) for k, _ in pb]
        for (ka, a), (_, b) in zip(pa, pb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(ka))
