"""Import the reference PyTorch implementation (read-only, /root/reference)
for golden-value generation in tests.

The reference imports `timm` and `torchvision`, which are not installed in
this image; neither is actually needed for the modules we test (timm only for
trunc_normal_, torchvision only for resnet/vgg builders we don't golden-test),
so minimal stubs are installed before import.
"""
import sys
import types

import torch


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

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision model builders unavailable in tests")

        tv_models.resnet18 = _unavailable
        tv_models.vgg19 = _unavailable
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
