"""Optimizers matching the reference training recipe.

/root/reference/train.py:17-94: two Adam(lr, betas=(0.5, 0.999)) groups —
{encoder, decoder, dense_motion} and {bg_predictor} — each with a MultiStep
LR schedule (x0.1 at the epoch milestones), plus per-subtree inf-norm
gradient clipping at max_norm=10 on encoder / dense_motion / bg_predictor
(the decoder is NOT clipped). VGG is frozen.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping

import jax
import jax.numpy as jnp
import optax

MAIN_SUBTREES = ("encoder", "decoder", "dense_motion")
BG_SUBTREES = ("bg_predictor",)
CLIP_SUBTREES = ("encoder", "dense_motion", "bg_predictor")


def multistep_lr(lr: float, milestones_epochs: Iterable[int], steps_per_epoch: int):
    boundaries = {int(m) * steps_per_epoch: 0.1 for m in milestones_epochs}
    return optax.piecewise_constant_schedule(lr, boundaries)


def clip_inf_norm_subtrees(grads: Mapping[str, Any], max_norm: float) -> Dict[str, Any]:
    """torch clip_grad_norm_(norm_type=inf) applied per top-level subtree."""
    out = dict(grads)
    for name in CLIP_SUBTREES:
        if name not in grads:
            continue
        g = grads[name]
        leaves = [jnp.max(jnp.abs(x)) for x in jax.tree.leaves(g)]
        total = jnp.max(jnp.stack(leaves)) if leaves else jnp.array(0.0)
        coef = max_norm / (total + 1e-6)
        coef = jnp.minimum(coef, 1.0)
        out[name] = jax.tree.map(lambda x: x * coef, g)
    return out


def _subtree_labels(params: Mapping[str, Any], subtrees) -> Dict[str, Any]:
    return {
        k: jax.tree.map(lambda _: "on" if k in subtrees else "off", v)
        if isinstance(v, Mapping)
        else ("on" if k in subtrees else "off")
        for k, v in params.items()
    }


def make_optimizer(
    params: Mapping[str, Any],
    lr: float,
    milestones_epochs,
    steps_per_epoch: int,
    subtrees,
) -> optax.GradientTransformation:
    """Adam(0.5, 0.999) + MultiStep LR on the given subtrees; zero elsewhere.

    NB: optax.masked alone is WRONG here — it passes unmasked updates through
    unchanged (i.e. raw gradients applied at lr=1). multi_transform routes the
    complement to set_to_zero.
    """
    sched = multistep_lr(lr, milestones_epochs, steps_per_epoch)
    tx = optax.adam(sched, b1=0.5, b2=0.999, eps=1e-8)
    labels = _subtree_labels(params, subtrees)
    return optax.multi_transform({"on": tx, "off": optax.set_to_zero()}, labels)
