"""Diagnose the input_formats/const-args misalignment in compile_streams.

jax 0.9 hoists trace-time constants as leading executable inputs
(params.const_args); Compiled.input_formats unflattens the kept input
layouts against the USER arg tree only, so when n_consts_kept > 0 every
format is shifted and device_put applies the wrong layouts (the
serve_formatted ValueError). This prints the counts that prove/disprove
that for the serving frame step on CPU (small config, fast compile).
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    from __graft_entry__ import _flagship_cfg

    from mrfa_tpu.models.mrfa import MRFA
    from mrfa_tpu.serving import AnimationServer

    size = 128
    cfg = _flagship_cfg(size, prior="fomm")
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
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }
    server = AnimationServer(model, variables)
    sources = rng.rand(2, size, size, 3).astype(np.float32)
    first = rng.rand(2, size, size, 3).astype(np.float32)
    state = server.open_streams(sources, first)

    from jax.experimental.layout import Format, Layout

    dummy_f = jnp.zeros_like(state.source)
    auto = jax.jit(
        lambda v, st, f: server._frame(v, st, f),
        in_shardings=Format(Layout.AUTO),
    )
    lowered = auto.lower(server.variables, state, dummy_f)
    compiled = lowered.compile()
    params = compiled._params
    exe = params.executable
    n_user = compiled.in_tree.num_leaves
    n_const = len(params.const_args)
    kept = sorted(exe._kept_var_idx)
    layouts = exe._xla_in_layouts
    print(f"user leaves: {n_user}")
    print(f"const args:  {n_const}")
    print(f"kept idx:    {len(kept)} (max {max(kept) if kept else -1})")
    print(f"xla layouts: {len(layouts)}")
    print(f"input_formats assumes num_leaves({n_user}) vs layouts({len(layouts)})"
          f" -> padding branch taken: {n_user > len(layouts)}")
    if n_const:
        print("MISALIGNED: input_formats shifts every user format by"
              f" the {n_const} const args" if len(layouts) != len(kept) or
              (kept and max(kept) >= n_user) else "const args present")
    # try the call through formats as serve_formatted does
    try:
        var_fmt, state_fmt, frame_fmt = compiled.input_formats[0]
        fv = jax.device_put(server.variables, var_fmt)
        fst = jax.device_put(state, state_fmt)
        ff = jax.device_put(dummy_f, frame_fmt)
        out = compiled(fv, fst, ff)
        print("call via input_formats: OK", np.asarray(out).mean())
    except Exception as e:  # noqa: BLE001
        print("call via input_formats FAILED:", str(e).splitlines()[0])


if __name__ == "__main__":
    main()
