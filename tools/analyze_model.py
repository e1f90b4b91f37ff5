#!/usr/bin/env python3
"""Model analysis: FLOPs, parameters, structure, HLO cost.

Equivalent of tools/analyze_model.py (fvcore flop/activation/param analysis),
computed from the *compiled program* instead: parameter table from the flax
tree, FLOPs from XLA's cost analysis of the jitted forward — i.e. the number
the hardware will actually run, fusions included.

  python tools/analyze_model.py --config-file configs/dota-1.0/1024.yaml \
      --tasks flop parameter structure [--image-size 1024]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", required=True)
    p.add_argument(
        "--tasks", nargs="+", default=["flop", "parameter"],
        choices=["flop", "parameter", "structure"],
    )
    p.add_argument("--image-size", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return p.parse_args()


def param_table(params, prefix="", rows=None):
    import numpy as np

    rows = rows if rows is not None else []
    for k, v in params.items():
        name = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            param_table(v, name, rows)
        else:
            rows.append((name, tuple(v.shape), int(np.prod(v.shape))))
    return rows


def main():
    from dafne_tpu.utils.platform import pin_platform_from_env
    pin_platform_from_env()
    args = parse_args()
    from dafne_tpu.config import load_config

    cfg = load_config(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    import jax
    import jax.numpy as jnp

    from dafne_tpu.data.mapper import pad_target_hw
    from dafne_tpu.models import build_model

    model = build_model(cfg)
    hw = (
        (args.image_size, args.image_size)
        if args.image_size
        else pad_target_hw(cfg, train=False)
    )
    x = jnp.zeros((1,) + hw + (3,), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    params = variables["params"]
    extra = {
        k: v for k, v in variables.items() if k != "params"
    }  # e.g. batch_stats for NORM=BN

    if "parameter" in args.tasks:
        rows = param_table(params)
        total = sum(r[2] for r in rows)
        print(f"\n=== Parameters: {total / 1e6:.2f} M total ===")
        groups = {}
        for name, shape, n in rows:
            top = name.split(".")[0]
            groups[top] = groups.get(top, 0) + n
        for g, n in sorted(groups.items()):
            print(f"  {g:20s} {n / 1e6:8.2f} M")

    if "flop" in args.tasks:
        fwd = jax.jit(lambda p, x: model.apply({"params": p, **extra}, x))
        compiled = fwd.lower(params, x).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
        print(f"\n=== XLA cost analysis (forward, image {hw}) ===")
        print(f"  flops:          {flops / 1e9:.2f} GFLOP")
        print(f"  bytes accessed: {bytes_ / 1e6:.1f} MB")

    if "structure" in args.tasks:
        print("\n=== Structure ===")
        print(
            model.tabulate(
                jax.random.PRNGKey(0), x,
                depth=2, console_kwargs={"width": 120},
            )
        )


if __name__ == "__main__":
    main()
