"""Jitted, mesh-sharded train/eval steps and the epoch loop.

TPU-native counterpart of /root/reference/train.py:17-94. One jitted step:
forward (train-mode BN, global batch stats = SyncBN), loss sum, backward,
per-subtree inf-norm clipping, two Adam groups, all under GSPMD with the
batch sharded over the 'data' mesh axis. Loss scalars come back replicated —
the reference's dist.reduce(dst=0)/world_size is just the global jnp.mean
here.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mrfa_tpu.train.optim import clip_inf_norm_subtrees


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state_main: Any
    opt_state_bg: Any


def create_train_state(variables, tx_main, tx_bg) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state_main=tx_main.init(params),
        opt_state_bg=tx_bg.init(params),
    )


def make_train_step(
    model,
    tx_main,
    tx_bg,
    *,
    use_bg: bool,
    dropout_flag: bool = False,
    clip_grad: bool = True,
    clip: float = 10.0,
    donate: bool = True,
):
    """Build the jitted train step for one (use_bg, dropout_flag) phase."""

    def step_fn(state: TrainState, batch: Mapping[str, jnp.ndarray], rng, dropout_p):
        rng_eq, rng_do = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["source"],
                batch["driving"],
                train=True,
                compute_loss=True,
                use_bg=use_bg,
                dropout_flag=dropout_flag,
                dropout_p=dropout_p,
                rngs={"equivariance": rng_eq, "dropout": rng_do},
                mutable=["batch_stats"],
            )
            gen, warp_vis, losses, kp_s, kp_d = outputs
            total = jnp.asarray(0.0)
            for v in losses.values():
                total = total + v
            aux = {
                "losses": losses,
                "batch_stats": updates["batch_stats"],
                "gen": gen,
                "warp_vis": warp_vis,
                "kp_s": kp_s,
                "kp_d": kp_d,
            }
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if clip_grad:
            grads = clip_inf_norm_subtrees(grads, clip)

        updates_main, new_om = tx_main.update(grads, state.opt_state_main, state.params)
        params = optax.apply_updates(state.params, updates_main)
        new_ob = state.opt_state_bg
        if use_bg:
            updates_bg, new_ob = tx_bg.update(grads, state.opt_state_bg, params)
            params = optax.apply_updates(params, updates_bg)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=aux["batch_stats"],
            opt_state_main=new_om,
            opt_state_bg=new_ob,
        )
        metrics = {"loss": total, **aux["losses"]}
        extras = {
            "gen": aux["gen"],
            "warp_vis": aux["warp_vis"],
            "kp_s": aux["kp_s"],
            "kp_d": aux["kp_d"],
        }
        return new_state, metrics, extras

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    def step_fn(variables, source, driving):
        gen, warp_vis, _, kp_s, kp_d = model.apply(
            variables, source, driving, train=False
        )
        return gen, warp_vis, kp_s, kp_d

    return jax.jit(step_fn)
