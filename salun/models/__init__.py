"""Model registry (parity: Classification/models/__init__.py:6-14 model_dict)."""

from .resnet import resnet18, resnet34, resnet50, ResNet, BasicBlock, Bottleneck
from .resnets import (
    resnet20s, resnet32s, resnet44s, resnet56s, resnet110s, ResNetS,
)
from .vgg import vgg16_bn, vgg16_bn_lth, VGG

model_dict = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet20s": resnet20s,
    "resnet44s": resnet44s,
    "resnet56s": resnet56s,
    "vgg16_bn": vgg16_bn,
    "vgg16_bn_lth": vgg16_bn_lth,
}


def create_model(arch: str, num_classes: int, imagenet: bool = False, **kw):
    """Build a model by registry name."""
    if arch not in model_dict:
        raise KeyError(f"unknown arch {arch!r}; available: {sorted(model_dict)}")
    fn = model_dict[arch]
    if arch in ("resnet18", "resnet50"):
        return fn(num_classes=num_classes, imagenet=imagenet, **kw)
    if arch == "resnet34":
        return fn(num_classes=num_classes, **kw)
    return fn(num_classes=num_classes, **kw)
