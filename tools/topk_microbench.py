"""Microbench the exact-top-k building blocks at the real decode shapes.

Times FULL chained programs (CLAUDE.md: single-op timings are bogus) for
each stage of ops/topk.py::exact_topk_set at the two shapes the decode
actually runs: per-level P3 (k=2000 of 245760) and the global cap
(k=4096 of 9856), batch 8.  Used to attribute the exact-vs-approx decode
gap (PROFILE_TRAIN.json decode_exact_ms vs decode_only_ms) to search /
selection / compaction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dafne_tpu.ops.topk import radix_select_kth
from dafne_tpu.utils.platform import setup_compilation_cache

ITERS = 30
WARMUP = 5


def timed(fn, *args):
    carry = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        carry = fn(carry, *args)
    float(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        carry = fn(carry, *args)
    float(carry)
    return (time.perf_counter() - t0) / ITERS * 1000.0


def main():
    setup_compilation_cache()
    rng = np.random.default_rng(0)
    shapes = [("p3", 8, 245760, 2000), ("global", 8, 9856, 4096)]
    out = {}
    for name, b, n, k in shapes:
        s_np = rng.uniform(0, 1, (b, n)).astype(np.float32)
        s_np[s_np < 0.8] = 0.0  # sparse like thresholded scores
        s = jnp.asarray(s_np)

        def chain(body):
            def f(carry, x):
                r = body(x + carry * 0.0)
                return jnp.sum(r).astype(jnp.float32)

            return jax.jit(f)

        # 1. search only
        def search_only(x):
            bits = jax.lax.bitcast_convert_type(x, jnp.int32)
            return radix_select_kth(bits, k).astype(jnp.float32)

        # 2. search + selection mask + cumsum (no scatter)
        def through_cumsum(x):
            bits = jax.lax.bitcast_convert_type(x, jnp.int32)
            vk = radix_select_kth(bits, k)
            above = bits > vk
            c_above = jnp.sum(above, axis=1, keepdims=True)
            ties = bits == vk
            tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=1)
            selected = above | (ties & (tie_rank <= (k - c_above)))
            pos = jnp.cumsum(selected.astype(jnp.int32), axis=1) - 1
            return pos.astype(jnp.float32).sum(axis=1)

        # 3. full exact_topk_set
        from dafne_tpu.ops.topk import exact_topk_set

        def full(x):
            v, i = exact_topk_set(x, k)
            return v.sum() + i.sum()

        # 4. scatter compaction alone (fixed selected mask)
        sel_np = np.zeros((b, n), bool)
        sel_np[:, rng.choice(n, k, replace=False)] = True
        pos_np = np.where(sel_np, np.cumsum(sel_np, axis=1) - 1, k).astype(
            np.int32
        )
        pos_c = jnp.asarray(pos_np)

        def scatter_only(x):
            posx = pos_c + (x[:, :1] * 0.0).astype(jnp.int32)
            idx_out = jnp.zeros((b, k), jnp.int32)
            row = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
            idx_out = idx_out.at[row, posx].set(
                jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n)),
                mode="drop",
            )
            return idx_out.astype(jnp.float32)

        # 5. approx_max_k for comparison
        def approx(x):
            v, i = jax.lax.approx_max_k(x, k, recall_target=0.99)
            return v.sum() + i.sum()

        # 6. final gather (take_along_axis) alone
        idx_c = jnp.asarray(
            np.sort(rng.choice(n, (b, k), replace=True), axis=1).astype(np.int32)
        )

        def gather_only(x):
            return jnp.take_along_axis(x, idx_c, axis=1)

        for label, body in [
            ("search", search_only),
            ("cumsum", through_cumsum),
            ("full", full),
            ("scatter", scatter_only),
            ("approx", approx),
            ("gather", gather_only),
        ]:
            ms = timed(chain(body), s)
            out[f"{name}_{label}_ms"] = round(ms, 2)
            print(name, label, round(ms, 2), flush=True)
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
