"""Device profile of the b=10 256px train step: top HLO ops/categories.

Same xplane parsing as profile_frame.py, over N full train steps (forward +
backward + both Adam updates). Answers "where do the 3.0 s/step go" — remat
recompute, Pallas backward, DMA stalls, or optimizer sweep.

Usage: python tools/profile_train.py [batch] [N]
MRFA_BENCH_DTYPE=f32 for full precision (default bf16 compute policy).
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_frame import parse_xplane  # noqa: E402


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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg = _flagship_cfg(size)
    cfg["train_params"]["remat"] = True  # matches config/vox1.yaml
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
    step = make_train_step(
        model, tx_main, tx_bg, use_bg=True,
        clip_grad=tp.get("clip_grad", False), clip=tp.get("clip", 10.0),
    )

    batch = {
        "source": jnp.asarray(rng.rand(b, size, size, 3).astype(np.float32)),
        "driving": jnp.asarray(rng.rand(b, size, size, 3).astype(np.float32)),
    }
    key = jax.random.PRNGKey(7)

    state, metrics, _ = step(state, batch, key, 0.0)  # warmup/compile
    _ = float(np.asarray(metrics["loss"]))

    logdir = "/tmp/mrfa_prof_train"
    jax.profiler.start_trace(logdir)
    for _ in range(n):
        key, sub = jax.random.split(key)
        state, metrics, _ = step(state, batch, sub, 0.0)
    _ = float(np.asarray(metrics["loss"]))
    jax.profiler.stop_trace()

    per_op, per_cat, total = parse_xplane(logdir)
    print(f"steps traced: {n}  (batch {b}, {dtype_flag})")
    print(f"total device-op time: {total*1e3:.2f} ms ({total/n*1e3:.1f} ms/step)")
    print("\n== by category ==")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {k:38s} {v*1e3:9.3f} ms  {100*v/max(total,1e-12):5.1f}%")
    print("\n== top ops ==")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:50]:
        print(f"  {k[:70]:70s} {v*1e3:9.3f} ms  {100*v/max(total,1e-12):5.1f}%")


if __name__ == "__main__":
    main()
