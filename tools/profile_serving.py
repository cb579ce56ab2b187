"""Device profile of the BATCHED serving frame step (AnimationServer) at S streams.

Same xplane parsing as profile_frame.py; answers "why does per-frame device
time grow with the stream count" (probe_serving shows 12.3 ms/frame at S=1 vs
~18 ms/frame at S=4..16) by aggregating device-core time per HLO category/op.

Usage: python tools/profile_serving.py [S]   (default 8)
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

    if os.environ.get("MRFA_BENCH_DTYPE", "bf16") == "bf16":
        precision.set_compute_dtype(jnp.bfloat16)

    from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

    _enable_compilation_cache()

    from mrfa_tpu.models.mrfa import MRFA
    from mrfa_tpu.serving import AnimationServer

    s = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size = 256
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
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    server = AnimationServer(model, variables)

    sources = rng.rand(s, size, size, 3).astype(np.float32)
    first = rng.rand(s, size, size, 3).astype(np.float32)
    state = server.open_streams(sources, first)
    frame = jnp.asarray(rng.rand(s, size, size, 3).astype(np.float32))

    aot = os.environ.get("MRFA_PROF_AOT", "0") == "1"
    if aot:
        fs = server.compile_streams(state)
        step = lambda: server.serve_formatted(fs, frame)  # noqa: E731
    else:
        step = lambda: server.serve(state, frame)  # noqa: E731
    out = step()
    _ = np.asarray(out)  # warmup + compile

    logdir = f"/tmp/mrfa_prof_s{s}{'_aot' if aot else ''}"
    N = 12
    jax.profiler.start_trace(logdir)
    for _ in range(N):
        out = step()
    _ = np.asarray(out)
    jax.profiler.stop_trace()
    per_op, per_cat, total = parse_xplane(logdir)
    print(f"steps traced: {N} at S={s}  ({total / N * 1e3:.2f} ms device-op/step)")

    print(f"total device-op time: {total*1e3:.2f} ms")
    print("\n== by category ==")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {k:38s} {v*1e3:9.3f} ms  {100*v/max(total,1e-12):5.1f}%")
    print("\n== top ops ==")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {k[:70]:70s} {v*1e3:9.3f} ms  {100*v/max(total,1e-12):5.1f}%")


if __name__ == "__main__":
    main()
