"""Converters for LPIPS evaluation weights.

The reference evaluates with `lpips.LPIPS(net='vgg')`
(/root/reference/reconstruction.py:39): a torchvision VGG16 backbone plus
learned per-channel linear weights (official file `lpips/weights/v0.1/vgg.pth`
with keys `lin{i}.model.1.weight` of shape (1, C, 1, 1)).

Given those two state dicts (downloaded separately — this image has no
network egress), these helpers produce variables for metrics.LpipsVgg.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from mrfa_tpu.utils.torch_convert import convert_state_dict, merge_into


def convert_lpips_vgg(
    lpips_variables: Mapping[str, Any],
    vgg16_state_dict: Mapping[str, Any],
    lpips_lin_state_dict: Mapping[str, Any],
):
    """Fill LpipsVgg variables from torchvision VGG16 + lpips linear weights."""
    conv = convert_state_dict(vgg16_state_dict, strip_prefix=None)
    # torchvision vgg16 keys `features.N.*` fold to `features_N`; the unused
    # classifier weights are dropped by merge_into as unexpected leaves
    params = dict(conv["params"])

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    for key, val in lpips_lin_state_dict.items():
        # lin{i}.model.1.weight (1, C, 1, 1) -> lin{i} (C,)
        if key.startswith("lin") and key.endswith("weight"):
            idx = key.split(".")[0]
            params[idx] = to_np(val).reshape(-1)

    merged, missing, unexpected = merge_into(
        lpips_variables, {"params": params}, strict=False
    )
    return merged, missing, unexpected
