"""Checkpointing: orbax save/restore + torch .pth import.

Covers the reference Logger checkpoint surface (/root/reference/logger.py:
50-88): periodic {model, optimizer, epoch} snapshots and restore — upgraded
to orbax (atomic, async-capable) with a torch-checkpoint import path for the
released .pth files (DataParallel 'module.' prefix stripped, conv kernels
OIHW->HWIO, BN stats split; the train-resume rule of dropping
`decoder.pos_embedding` keys is exposed as `drop_decoder_pos_embedding`).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None

from mrfa_tpu.utils.torch_convert import (
    convert_state_dict,
    load_torch_checkpoint,
    merge_into,
)


def save_checkpoint(path: str, tree: Dict[str, Any], step: int) -> None:
    """Save a pytree checkpoint at `path`/<step> (orbax StandardSave)."""
    assert ocp is not None, "orbax-checkpoint unavailable"
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, str(step)), tree, force=True)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(path: str, target: Dict[str, Any], step: Optional[int] = None):
    """Restore a pytree checkpoint saved by save_checkpoint."""
    assert ocp is not None, "orbax-checkpoint unavailable"
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.join(os.path.abspath(path), str(step)), target
        )
    return restored, step


def remap_reference_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Reference-MRFA-specific state_dict key fixups before conversion.

    - `vgg.slice<k>.<i>.*` -> `vgg.features.<i>.*`: the reference Vgg19
      repackages torchvision features into slice1..slice5 but keeps the
      original feature indices as child names (/root/reference/modules/
      model.py:88-102); our flax Vgg19 names convs features_<i> directly.
    - drop non-parameter buffers with no flax counterpart: the antialias
      gaussian kernels (`pyramid.downs.*.weight`, `down.weight` — recomputed
      in ops/resize.py) and the Vgg19 mean/std constants.
    """
    import re

    out: Dict[str, Any] = {}
    for k, v in sd.items():
        base = k[len("module."):] if k.startswith("module.") else k
        if re.match(r"^(pyramid\.downs\.|down\.weight$|vgg\.(mean|std)$)", base):
            continue
        k = re.sub(r"vgg\.slice\d+\.", "vgg.features.", k)
        out[k] = v
    return out


def load_torch_weights_into(
    variables: Dict[str, Any],
    pth_path: str,
    *,
    drop_decoder_pos_embedding: bool = False,
    strict: bool = False,
    verbose: bool = True,
):
    """Import a reference .pth checkpoint into flax variables.

    Returns (new_variables, missing, unexpected).
    """
    sd = load_torch_checkpoint(pth_path)
    if drop_decoder_pos_embedding:
        sd = {k: v for k, v in sd.items() if "decoder.pos_embedding" not in k}
    sd = remap_reference_keys(sd)
    converted = convert_state_dict(sd)
    merged, missing, unexpected = merge_into(variables, converted, strict=strict)
    if verbose:
        if missing:
            print(f"[checkpoint] {len(missing)} leaves not found in .pth "
                  f"(kept init): {missing[:8]}{'...' if len(missing) > 8 else ''}")
        if unexpected:
            print(f"[checkpoint] {len(unexpected)} .pth leaves unused: "
                  f"{unexpected[:8]}{'...' if len(unexpected) > 8 else ''}")
    return merged, missing, unexpected
