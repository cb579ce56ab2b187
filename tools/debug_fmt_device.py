"""On-device introspection of the serve_formatted layout mismatch.

For every kept user input leaf, prints three layouts when they disagree:
  required = exe._xla_in_layouts aligned by _kept_var_idx (what call() checks)
  assigned = compiled.input_formats leaf (what compile_streams device_puts to)
  actual   = the array's layout after device_put(assigned)
Mismatch assigned!=required -> input_formats misalignment (jax bug);
actual!=assigned -> device_put not honoring formats on this backend.
"""
from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mrfa_tpu import precision

    precision.set_compute_dtype(jnp.bfloat16)

    from __graft_entry__ import _enable_compilation_cache, _flagship_cfg

    _enable_compilation_cache()

    from mrfa_tpu.models.mrfa import MRFA
    from mrfa_tpu.serving import AnimationServer

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
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }
    server = AnimationServer(model, variables)
    s = 1
    state = server.open_streams(
        rng.rand(s, size, size, 3).astype(np.float32),
        rng.rand(s, size, size, 3).astype(np.float32),
    )

    from jax.experimental.layout import Format, Layout

    dummy_f = jnp.zeros_like(state.source)
    auto = jax.jit(
        lambda v, st, f: server._frame(v, st, f),
        in_shardings=Format(Layout.AUTO),
    )
    compiled = auto.lower(server.variables, state, dummy_f).compile()
    params = compiled._params
    exe = params.executable
    n_user = compiled.in_tree.num_leaves
    n_const = len(params.const_args)
    kept = sorted(exe._kept_var_idx)
    layouts = exe._xla_in_layouts
    print(f"user leaves {n_user}, const args {n_const}, "
          f"kept {len(kept)} (max {max(kept)}), xla layouts {len(layouts)}")

    # required layout per user leaf index
    required = {}
    it = iter(layouts)
    for i in kept:
        required[i] = next(it)

    fmts = compiled.input_formats  # user tree
    leaves_fmt, treedef = jax.tree_util.tree_flatten(
        fmts, is_leaf=lambda x: isinstance(x, Format) or x is None
    )
    args_leaves = jax.tree_util.tree_leaves((server.variables, state, dummy_f))
    print(f"flat fmt leaves {len(leaves_fmt)}, arg leaves {len(args_leaves)}")

    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path((server.variables, state, dummy_f))[0]]

    n_mis = 0
    for i, (fmt, arg) in enumerate(zip(leaves_fmt, args_leaves)):
        req = required.get(i)
        asg = fmt.layout if isinstance(fmt, Format) else None
        if (req is None) != (asg is None) or (req is not None and asg != req):
            n_mis += 1
            if n_mis <= 12:
                print(f"[{i}] {paths[i]}\n  required {req}\n  assigned {asg}")
        elif req is not None and asg is not None:
            arr = jax.device_put(arg, fmt)
            act = arr.format.layout
            if act != asg and n_mis <= 12:
                n_mis += 1
                print(f"[{i}] {paths[i]} device_put drift\n"
                      f"  assigned {asg}\n  actual   {act}")
    print(f"total disagreements: {n_mis}")


if __name__ == "__main__":
    main()
