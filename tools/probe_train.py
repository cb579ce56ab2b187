"""Train-step throughput + MFU on one chip (VERDICT r2 item 5).

Times the full b=10 256px MTIA train step (forward with all losses, backward,
both Adam updates, BN stat update) with honest value-fetch timing (see
bench.py docstring), and reports samples/s, the XLA cost-model FLOPs/step,
and MFU against the dtype-matched peak. Reference trains batch 80 / 8 GPUs
= 10/chip (/root/reference/config/vox1.yaml:77, run.py:59).

Usage: python tools/probe_train.py [batch]   (default 10)
MRFA_BENCH_DTYPE=f32 for full precision (default bf16 compute policy).
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS_BF16 = 197e12  # TPU v5e
PEAK_FLOPS_F32 = 98.5e12


def main():
    import jax
    import jax.numpy as jnp

    from mrfa_tpu import precision

    dtype_flag = os.environ.get("MRFA_BENCH_DTYPE", "bf16")
    if dtype_flag == "bf16":
        precision.set_compute_dtype(jnp.bfloat16)

    from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

    _enable_compilation_cache()

    from mrfa_tpu.models.mrfa import MRFA
    from mrfa_tpu.train.optim import BG_SUBTREES, MAIN_SUBTREES, make_optimizer
    from mrfa_tpu.train.trainer import create_train_state, make_train_step

    size = 256
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = _flagship_cfg(size)
    model = MRFA(cfg)
    rng = np.random.RandomState(0)

    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "equivariance": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    init_fn = jax.jit(
        functools.partial(model.init, train=True, compute_loss=True, use_bg=True)
    )
    variables = init_fn(rngs, dummy, dummy)

    tp = cfg["train_params"]
    tx_main = make_optimizer(
        variables["params"], tp["lr"], tp["epoch_milestones"], 1000, MAIN_SUBTREES
    )
    tx_bg = make_optimizer(
        variables["params"], tp["lr"], tp["epoch_milestones"], 1000, BG_SUBTREES
    )
    state = create_train_state(variables, tx_main, tx_bg)
    # bg-phase step (the steady-state vox1 phase: both optimizers live)
    step = make_train_step(
        model, tx_main, tx_bg, use_bg=True,
        clip_grad=tp.get("clip_grad", False), clip=tp.get("clip", 10.0),
    )

    batch = {
        "source": jnp.asarray(rng.rand(b, size, size, 3).astype(np.float32)),
        "driving": jnp.asarray(rng.rand(b, size, size, 3).astype(np.float32)),
    }
    key = jax.random.PRNGKey(7)

    flops = None
    try:
        cost = (
            step.lower(state, batch, key, 0.0).compile().cost_analysis()
        )
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", 0.0)) or None
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", flush=True)

    state, metrics, _ = step(state, batch, key, 0.0)  # warmup/compile
    _ = float(np.asarray(metrics["loss"]))

    n = 8
    t0 = time.perf_counter()
    for i in range(n):
        key, sub = jax.random.split(key)
        state, metrics, _ = step(state, batch, sub, 0.0)
    loss = float(np.asarray(metrics["loss"]))  # value fetch = completion
    dt = (time.perf_counter() - t0) / n
    sps = b / dt
    line = (
        f"train b={b} {dtype_flag}: {dt * 1e3:8.1f} ms/step, "
        f"{sps:6.2f} samples/s/chip, loss {loss:.4f}"
    )
    if flops:
        peak = PEAK_FLOPS_BF16 if dtype_flag == "bf16" else PEAK_FLOPS_F32
        mfu = flops / dt / peak
        line += f", {flops / 1e12:.1f} TFLOP/step, MFU {mfu:.3f}"
    print(line, flush=True)


if __name__ == "__main__":
    main()
