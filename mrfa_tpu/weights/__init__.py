"""Vendored pretrained-backbone weights (VGG19 perceptual, LPIPS-VGG16).

The reference's training loss uses torchvision's ImageNet-pretrained VGG19
(/root/reference/modules/model.py:87 `models.vgg19(pretrained=True)`) and its
eval harness uses `lpips.LPIPS(net='vgg')` (/root/reference/reconstruction.py:39)
— a VGG16 backbone plus learned per-channel linear weights.

This build environment has no network egress and no torchvision/lpips
packages, so the weights themselves cannot be downloaded here. The supported
path is OFFLINE CONVERSION: on any machine with the torch weight files, run

    python -m mrfa_tpu.cli.convert_backbones \
        --vgg19 vgg19-dcbb9e9d.pth \
        --vgg16 vgg16-397923af.pth --lpips_lin <lpips>/weights/v0.1/vgg.pth

which writes `vgg19_imagenet.npz` / `lpips_vgg16.npz` into this package
directory; every loader below then picks them up automatically. The
converter and the consuming architectures are golden-tested in-env against
pure-torch clones with random weights (tests/test_backbones_golden.py), so a
converted file is correct by construction.

When the files are absent:
  - training falls back to the randomly initialized VGG19 (loud warning) —
    losses remain well-defined but are NOT the reference's perceptual loss;
  - reconstruction falls back to uniform LPIPS channel weights (documented in
    metrics.py) — comparable across runs of this framework only.
"""
from __future__ import annotations

import os
import warnings
from typing import Any, Dict, Optional

import numpy as np

WEIGHTS_DIR = os.path.dirname(os.path.abspath(__file__))
VGG19_FILE = os.path.join(WEIGHTS_DIR, "vgg19_imagenet.npz")
LPIPS_FILE = os.path.join(WEIGHTS_DIR, "lpips_vgg16.npz")


def save_tree(path: str, tree: Dict[str, Any]) -> None:
    """Save a nested dict-of-arrays as an npz with '/'-joined keys."""
    flat: Dict[str, np.ndarray] = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    rec(tree, "")
    np.savez_compressed(path, **flat)


def load_tree(path: str) -> Dict[str, Any]:
    """Inverse of save_tree."""
    out: Dict[str, Any] = {}
    with np.load(path) as data:
        for key in data.files:
            node = out
            segs = key.split("/")
            for seg in segs[:-1]:
                node = node.setdefault(seg, {})
            node[segs[-1]] = data[key]
    return out


def vgg19_params() -> Optional[Dict[str, Any]]:
    """Vendored ImageNet VGG19 params for nn/vgg.py::Vgg19, or None."""
    if os.path.exists(VGG19_FILE):
        return load_tree(VGG19_FILE)
    return None


def lpips_variables() -> Optional[Dict[str, Any]]:
    """Vendored LPIPS(net='vgg') variables for metrics.py::LpipsVgg, or None."""
    if os.path.exists(LPIPS_FILE):
        return {"params": load_tree(LPIPS_FILE)}
    return None


def overlay_vgg19(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Overlay vendored VGG19 weights onto model variables' `vgg` subtree.

    Returns the (possibly updated) variables; warns loudly when the vendored
    file is absent so a training run on a random VGG is never silent.
    """
    pretrained = vgg19_params()
    if "vgg" not in variables.get("params", {}):
        return variables
    if pretrained is None:
        warnings.warn(
            "mrfa_tpu/weights/vgg19_imagenet.npz not found: the perceptual "
            "loss will use a RANDOMLY INITIALIZED VGG19, which is not the "
            "reference's loss. Convert the torchvision weights offline with "
            "`python -m mrfa_tpu.cli.convert_backbones --vgg19 ...`.",
            stacklevel=2,
        )
        return variables
    from mrfa_tpu.utils.torch_convert import merge_into

    merged_vgg, missing, unexpected = merge_into(
        variables["params"]["vgg"], pretrained
    )
    if missing or unexpected:
        raise ValueError(
            f"vendored VGG19 does not match the model's vgg subtree: "
            f"missing={missing[:4]} unexpected={unexpected[:4]}"
        )
    params = dict(variables["params"])
    params["vgg"] = merged_vgg
    out = dict(variables)
    out["params"] = params
    return out
