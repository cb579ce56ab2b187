"""Import the reference PyTorch implementation (read-only, /root/reference)
for golden-value generation in tests.

The reference imports `timm` and `torchvision`, which are not installed in
this image. `timm` is only needed for trunc_normal_ (stubbed from torch).
For `torchvision.models` we install FUNCTIONAL pure-torch re-implementations
of vgg19 and resnet18 with torchvision-exact module naming: random-init
weights (ImageNet weights are unobtainable in this environment), but the
same architecture and state_dict keys — which is exactly what the golden
tests need (they compare random-init reference modules against converted
weights; see tests/test_backbones_golden.py).
"""
import sys
import types

import torch
from torch import nn

# torchvision vgg19 cfg 'E': conv channel plan, 'M' = 2x2 max pool
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


class _VGG(nn.Module):
    """Structure/naming-compatible subset of torchvision.models.VGG."""

    def __init__(self, cfg, num_classes=1000):
        super().__init__()
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                in_ch = v
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        return self.classifier(torch.flatten(x, 1))


def vgg19(pretrained=False, **kwargs):
    """Random-init VGG19 (ImageNet weights unobtainable in this image)."""
    return _VGG(_VGG19_CFG, **kwargs)


def vgg16(pretrained=False, **kwargs):
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    return _VGG(cfg, **kwargs)


class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    """Structure/naming-compatible subset of torchvision.models.ResNet."""

    def __init__(self, layers=(2, 2, 2, 2), num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        layers = [_BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            layers.append(_BasicBlock(planes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        return self.fc(torch.flatten(x, 1))


def resnet18(pretrained=False, **kwargs):
    return _ResNet((2, 2, 2, 2), **kwargs)


def _install_stubs():
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_wi = types.ModuleType("timm.models.layers.weight_init")
        timm_wi.trunc_normal_ = torch.nn.init.trunc_normal_
        timm_layers.weight_init = timm_wi
        timm_models.layers = timm_layers
        timm.models = timm_models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_layers
        sys.modules["timm.models.layers.weight_init"] = timm_wi

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_utils = types.ModuleType("torchvision.models._utils")
        tv_models.resnet18 = resnet18
        tv_models.vgg19 = vgg19
        tv_models.vgg16 = vgg16
        tv_utils.IntermediateLayerGetter = None
        tv_models._utils = tv_utils
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models._utils"] = tv_utils


def load_reference():
    """Make `modules.*` of the reference importable; returns its root path."""
    _install_stubs()
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    return ref
