"""Capture a device profile of the serving frame step and print the top ops.

Runs N frame steps under jax.profiler.trace, then parses the xplane proto
(tensorboard_plugin_profile / tensorflow are present in this image) and
aggregates device-core time by HLO op category and by individual op, giving
the exact top time sinks instead of scan-chain subtraction estimates.
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

import numpy as np


def parse_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    per_op = defaultdict(float)
    per_cat = defaultdict(float)
    total = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        stat_meta = {m.id: m.name for m in plane.stat_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            # device op lines are the XLA Ops lines; skip steps/queues
            if "xla op" not in lname and "xla modules" not in lname:
                if "op" not in lname:
                    continue
            if "module" in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12  # seconds
                cat = None
                for st in ev.stats:
                    sname = stat_meta.get(st.metadata_id, "")
                    if sname in ("hlo_category", "category"):
                        cat = st.str_value or None
                per_op[name] += dur
                per_cat[cat or name.split(".")[0]] += dur
                total += dur
    return per_op, per_cat, total


def main():
    logdir = "/tmp/mrfa_prof"
    if len(sys.argv) > 1 and sys.argv[1] == "--parse-only":
        per_op, per_cat, total = parse_xplane(logdir)
    else:
        import jax
        import jax.numpy as jnp

        from mrfa_tpu import precision

        if os.environ.get("MRFA_BENCH_DTYPE", "bf16") == "bf16":
            precision.set_compute_dtype(jnp.bfloat16)

        from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

        _enable_compilation_cache()
        from mrfa_tpu.animate import Animator
        from mrfa_tpu.models.mrfa import MRFA
        from mrfa_tpu.ops.resize import AntiAliasParams, antialias_downsample

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
        import functools

        init_fn = jax.jit(
            functools.partial(model.init, train=True, compute_loss=True, use_bg=True)
        )
        variables = init_fn(rngs, dummy, dummy)
        variables = {
            "params": variables["params"], "batch_stats": variables["batch_stats"]
        }
        animator = Animator(model, variables, relative=True)
        src = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
        frame0 = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
        img_down = antialias_downsample(src, AntiAliasParams.create(0.25))
        kp_source = animator._encode(animator.variables, src)
        kp_d0 = animator._encode(animator.variables, frame0)
        scale = jnp.float32(1.0)
        cache = animator._encode_source(animator.variables, src, kp_source, img_down)

        def step(f):
            return animator._frame(
                animator.variables, src, img_down, kp_source, kp_d0, f, scale, cache
            )

        out, _, _ = step(frame0)
        _ = np.asarray(out)  # warmup + compile

        N = 30
        jax.profiler.start_trace(logdir)
        for _ in range(N):
            out, _, _ = step(frame0)
        _ = np.asarray(out)
        jax.profiler.stop_trace()
        per_op, per_cat, total = parse_xplane(logdir)
        print(f"frames traced: {N}")

    print(f"total device-op time: {total*1e3:.2f} ms")
    print("\n== by category ==")
    for k, v in sorted(per_cat.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {k:38s} {v*1e3:9.3f} ms  {100*v/max(total,1e-12):5.1f}%")
    print("\n== top ops ==")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {k[:70]:70s} {v*1e3:9.3f} ms  {100*v/max(total,1e-12):5.1f}%")


if __name__ == "__main__":
    main()
