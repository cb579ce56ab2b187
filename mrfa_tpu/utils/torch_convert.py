"""Mechanical PyTorch state_dict -> flax variables converter.

Every flax module in this framework names its submodules after the torch
attribute path of the reference model (ModuleList/Sequential indices are
folded into the parent name with '_': torch `down_blocks.0.conv.weight`
maps to flax `down_blocks_0 / conv / kernel`), so conversion is a pure
leaf-name + layout transform:

  weight (4-D, conv, OIHW)  -> kernel, transposed to HWIO
  weight (2-D, linear)      -> kernel, transposed to (in, out)
  weight (1-D, *Norm affine)-> scale
  bias                      -> bias
  running_mean/running_var  -> batch_stats mean/var
  num_batches_tracked       -> dropped
  anything else             -> kept verbatim as a params leaf

This covers the reference checkpoints (/root/reference/README.md:53-54 after
`module.` prefix stripping, see logger.py:60-66 there) and torchvision
vgg19/resnet18 state dicts for the loss/backbone networks.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = value


def _fold_indices(segments):
    """Fold pure-digit path segments into the preceding name with '_'."""
    out = []
    for seg in segments:
        if seg.isdigit() and out:
            out[-1] = f"{out[-1]}_{seg}"
        else:
            out.append(seg)
    return out


def convert_state_dict(
    sd: Mapping[str, Any],
    strip_prefix: str = "module.",
) -> Dict[str, Dict[str, Any]]:
    """Convert a torch state_dict to {'params': ..., 'batch_stats': ...}."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        segs = _fold_indices(key.split("."))
        mod_path, leaf = segs[:-1], segs[-1]

        if leaf == "weight":
            if arr.ndim == 4:
                _set_path(params, (*mod_path, "kernel"), arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                _set_path(params, (*mod_path, "kernel"), arr.transpose(1, 0))
            elif arr.ndim == 1:
                _set_path(params, (*mod_path, "scale"), arr)
            else:
                _set_path(params, (*mod_path, "weight"), arr)
        elif leaf == "bias":
            _set_path(params, (*mod_path, "bias"), arr)
        elif leaf == "running_mean":
            _set_path(batch_stats, (*mod_path, "mean"), arr)
        elif leaf == "running_var":
            _set_path(batch_stats, (*mod_path, "var"), arr)
        else:
            _set_path(params, (*mod_path, leaf), arr)

    return {"params": params, "batch_stats": batch_stats}


def merge_into(
    target: Mapping[str, Any],
    source: Mapping[str, Any],
    path: str = "",
    strict: bool = True,
):
    """Overlay `source` leaves onto the structure of `target`.

    Returns (merged, missing, unexpected): `missing` are target leaves with no
    source value (kept from target); `unexpected` are source leaves the target
    has no slot for (dropped). With strict=True a shape mismatch raises.
    """
    import jax.numpy as jnp

    missing, unexpected = [], []

    def rec(tgt, src, p):
        if not isinstance(tgt, Mapping):
            if src is None:
                missing.append(p)
                return tgt
            src_arr = np.asarray(src)
            if tuple(src_arr.shape) != tuple(np.shape(tgt)):
                msg = f"shape mismatch at {p}: target {np.shape(tgt)} vs source {src_arr.shape}"
                if strict:
                    raise ValueError(msg)
                missing.append(p + " (" + msg + ")")
                return tgt
            return jnp.asarray(src_arr, dtype=jnp.asarray(tgt).dtype)
        out = {}
        src = src if isinstance(src, Mapping) else {}
        for k, v in tgt.items():
            out[k] = rec(v, src.get(k), f"{p}/{k}" if p else k)
        for k in src:
            if k not in tgt:
                unexpected.append(f"{p}/{k}" if p else k)
        return out

    merged = rec(dict(target), dict(source), path)
    return merged, missing, unexpected


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference `.pth` checkpoint's model state_dict (CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd
