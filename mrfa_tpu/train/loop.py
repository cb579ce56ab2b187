"""The training driver: epoch loop, phase management, checkpoint cadence.

Mirrors /root/reference/train.py:17-94 behavior on top of the jitted sharded
step: DatasetRepeater epochs, per-epoch LR milestones (folded into the optax
schedule), bg-predictor phase switching at bg_start, TPSM dropout schedule,
rank-0-style logging (process_index 0), per-epoch visualization + orbax
checkpoints.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mrfa_tpu.data.dataset import BatchLoader, DatasetRepeater
from mrfa_tpu.models.mrfa import MRFA
from mrfa_tpu.parallel.mesh import make_mesh, shard_batch
from mrfa_tpu.train.optim import BG_SUBTREES, MAIN_SUBTREES, make_optimizer
from mrfa_tpu.train.trainer import TrainState, create_train_state, make_train_step
from mrfa_tpu.utils.checkpoint import (
    load_torch_weights_into,
    restore_checkpoint,
    save_checkpoint,
)
from mrfa_tpu.utils.logger import Logger


def init_model_variables(model: MRFA, cfg: Dict[str, Any], seed: int = 0):
    """Initialize variables with tiny dummy batch at the configured size."""
    size = cfg["raft_flow"]["size"]
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "equivariance": jax.random.PRNGKey(seed + 1),
        "dropout": jax.random.PRNGKey(seed + 2),
    }
    import functools

    tp = cfg["train_params"]
    use_bg = tp["bg_start"] < tp["num_epochs"]
    init_fn = jax.jit(
        functools.partial(
            model.init, train=True, compute_loss=True, use_bg=use_bg
        )
    )
    return init_fn(rngs, dummy, dummy)


def restore_train_state(checkpoint: str, state: TrainState):
    """TRUE resume from an orbax checkpoint saved by the epoch loop.

    Improves on /root/reference/train.py:27-32 (which restores params only,
    restarting Adam moments and the LR schedule from zero): restores params,
    batch_stats, BOTH optimizer states (the MultiStep LR position rides along
    in the scale_by_schedule counts), the rng-folding step counter, and the
    epoch. Returns (state, start_epoch) with start_epoch = saved epoch + 1.
    """
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state_main": state.opt_state_main,
        "opt_state_bg": state.opt_state_bg,
        "epoch": 0,
        "step": 0,
    }
    restored, _ = restore_checkpoint(checkpoint, target)
    state = state.replace(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state_main=restored["opt_state_main"],
        opt_state_bg=restored["opt_state_bg"],
    )
    return state, int(restored["epoch"]) + 1


def train(
    config: Dict[str, Any],
    model: MRFA,
    checkpoint: Optional[str],
    log_dir: str,
    dataset,
    *,
    seed: int = 0,
    max_steps_per_epoch: Optional[int] = None,
):
    tp = config["train_params"]
    num_epochs = tp["num_epochs"]
    bg_start = tp["bg_start"]
    prior_model = tp["prior_model"]

    # optional mixed-precision training (conv/matmul compute in bf16,
    # geometry f32 — see mrfa_tpu/precision.py; default f32 = reference parity)
    if tp.get("compute_dtype") in ("bf16", "bfloat16"):
        from mrfa_tpu import precision

        precision.set_compute_dtype(jnp.bfloat16)

    if tp.get("num_repeats", 1) != 1:
        dataset = DatasetRepeater(dataset, tp["num_repeats"])

    n_proc = jax.process_count()
    global_batch = tp["batch_size"]
    if n_proc == 1:
        # data axis must divide the batch placed on it (debug configs can
        # have batch < device count); unused devices stay idle
        import math
        import warnings

        n_data = math.gcd(global_batch, jax.device_count())
        if n_data < jax.device_count() and global_batch >= jax.device_count():
            # not the batch < devices debug case: a production batch that
            # simply doesn't divide the device count would silently idle
            # most of the machine (e.g. batch 12 on 8 chips -> 4 devices)
            warnings.warn(
                f"batch_size={global_batch} is not divisible by "
                f"device_count={jax.device_count()}: training will use only "
                f"{n_data} device(s). Pick a divisible batch size.",
                stacklevel=2,
            )
        mesh = make_mesh(n_data=n_data, devices=jax.devices()[:n_data])
    else:
        mesh = make_mesh()
    loader = BatchLoader(
        dataset,
        batch_size=global_batch // n_proc,
        shuffle=True,
        drop_last=True,
        seed=seed,
        shard_index=jax.process_index(),
        num_shards=n_proc,
        # reference: torch DataLoader num_workers=8 (train.py:40)
        num_workers=tp.get("num_workers", 4),
    )
    steps_per_epoch = len(loader)
    if max_steps_per_epoch is not None:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    variables = init_model_variables(model, config, seed)
    # perceptual loss runs on the ImageNet VGG19 when the vendored weights
    # are present (reference: models.vgg19(pretrained=True), model.py:87);
    # a .pth checkpoint restored below overrides them with its own vgg
    from mrfa_tpu.weights import overlay_vgg19

    variables = overlay_vgg19(variables)
    if checkpoint is not None and checkpoint.endswith(".pth"):
        # reference semantics (/root/reference/train.py:27-32): params only,
        # drop decoder.pos_embedding, optimizer/epoch restart from scratch
        variables, _, _ = load_torch_weights_into(
            variables, checkpoint, drop_decoder_pos_embedding=True
        )

    tx_main = make_optimizer(
        variables["params"], tp["lr"], tp["epoch_milestones"], steps_per_epoch,
        MAIN_SUBTREES,
    )
    tx_bg = make_optimizer(
        variables["params"], tp["lr"], tp["epoch_milestones"], steps_per_epoch,
        BG_SUBTREES,
    )
    state = create_train_state(variables, tx_main, tx_bg)

    start_epoch = 0
    if checkpoint is not None and not checkpoint.endswith(".pth"):
        state, start_epoch = restore_train_state(checkpoint, state)
        # orbax returns arrays COMMITTED to their save-time (single) device;
        # jit under the multi-device mesh context rejects committed
        # single-device inputs. Replicate the restored state over the mesh
        # (the fresh-state path's arrays are uncommitted and auto-place).
        from jax.sharding import NamedSharding, PartitionSpec

        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

    steps = {}
    rng = jax.random.PRNGKey(seed + 1234)
    logger = Logger(
        log_dir,
        visualizer_params=config.get("visualizer_params") or {},
        checkpoint_freq=tp.get("checkpoint_freq", 100),
    )

    # set_mesh as a context manager: exposes axes to in-model sharding
    # constraints during tracing, and restores the previous global mesh on
    # exit (embedding contexts may run train() then something else)
    with jax.sharding.set_mesh(mesh), mesh:
        for epoch in range(start_epoch, num_epochs):
            use_bg = epoch >= bg_start and bg_start < num_epochs
            if prior_model == "tpsm" and epoch < tp.get("dropout_epoch", 0):
                dropout_flag = True
                dropout_p = min(
                    epoch / tp["dropout_inc_epoch"] * tp["dropout_maxp"]
                    + tp["dropout_startp"],
                    tp["dropout_maxp"],
                )
            else:
                dropout_flag = False
                dropout_p = 0.0

            phase = (use_bg, dropout_flag)
            if phase not in steps:
                steps[phase] = make_train_step(
                    model, tx_main, tx_bg,
                    use_bg=use_bg, dropout_flag=dropout_flag,
                    clip_grad=tp.get("clip_grad", False), clip=tp.get("clip", 10.0),
                )
            step_fn = steps[phase]

            t0 = time.time()
            last_batch = None
            last_extras = None
            # metrics stay on device during the hot loop (no per-step blocking
            # transfer), flushed to host every flush_every steps so a
            # vox1-scale epoch (~2.4k steps x 150 repeats) never accumulates
            # hundreds of thousands of tiny live device buffers
            flush_every = 64
            metric_buf = []
            for it, batch in enumerate(loader.epoch(epoch)):
                if it >= steps_per_epoch:
                    break
                device_batch = shard_batch(
                    {"source": batch["source"], "driving": batch["driving"]}, mesh
                )
                state, metrics, extras = step_fn(
                    state, device_batch, rng, jnp.float32(dropout_p)
                )
                metric_buf.append(
                    {k: v for k, v in metrics.items() if k != "loss"}
                )
                last_batch, last_extras = device_batch, extras
                if len(metric_buf) >= flush_every:
                    if jax.process_index() == 0:
                        for host_metrics in jax.device_get(metric_buf):
                            logger.log_iter(host_metrics)
                    metric_buf = []

            if jax.process_index() == 0:
                for host_metrics in jax.device_get(metric_buf):
                    logger.log_iter(host_metrics)
                dt = time.time() - t0
                print(f"epoch {epoch}: {steps_per_epoch} steps in {dt:.1f}s "
                      f"({steps_per_epoch * global_batch / max(dt, 1e-9):.2f} samples/s)")
                out = None
                if last_extras is not None:
                    rec = jnp.concatenate(
                        [last_extras["warp_vis"], last_extras["gen"]], axis=2
                    )
                    out = {
                        "rec": np.asarray(rec[:1]),
                        "kp_s": np.asarray(last_extras["kp_s"][:1]),
                        "kp_d": np.asarray(last_extras["kp_d"][:1]),
                    }
                    inp = {
                        "source": np.asarray(last_batch["source"][:1]),
                        "driving": np.asarray(last_batch["driving"][:1]),
                    }
                    logger.log_epoch(epoch, inp=inp, out=out)
                else:
                    logger.log_epoch(epoch)

                if (epoch + 1) % logger.checkpoint_freq == 0 or epoch == num_epochs - 1:
                    save_checkpoint(
                        f"{log_dir}/ckpt",
                        {
                            "params": state.params,
                            "batch_stats": state.batch_stats,
                            "opt_state_main": state.opt_state_main,
                            "opt_state_bg": state.opt_state_bg,
                            "epoch": epoch,
                            "step": int(state.step),
                        },
                        step=epoch,
                    )
    return state
