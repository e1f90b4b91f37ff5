"""Exact top-k SET selection without a variadic sort (TPU-native).

The reference decode takes exact per-level top-k (dafne_outputs.py:824-858,
torch.topk).  On TPU, `jax.lax.top_k` with k ~ n/2 of ~10k, or k=2000 of
~250k, lowers to a full variadic sort — the degenerate case (measured
~20 ms/batch, PROFILE_TRAIN.json round 2), which is why the decode shipped
with `lax.approx_max_k` (recall 0.99) instead.  This module provides an
EXACT alternative with TPU-friendly primitives only:

  1. bitcast the non-negative f32 scores to int32 (order-isomorphic),
  2. binary-search the k-th largest bit pattern: 31 fixed iterations of
     (compare + row-sum) — pure elementwise/reduce work, no sort,
  3. select `score > v_k` plus the first (k - count) ties in index order
     (exactly `lax.top_k`'s stable tie-break set),
  4. compact selected indices into k slots via cumsum + one scatter.

The returned SET equals `jax.lax.top_k`'s exactly; the returned ORDER is
ascending-index rather than descending-score.  Decode does not depend on
candidate order (NMS re-sorts class-major internally; the post-NMS top-k
re-orders the output), so set-equality is sufficient there — asserted by
tests/test_topk.py against lax.top_k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_topk_set(scores: jnp.ndarray, k: int):
    """Exact top-k selection over the last axis of non-negative scores.

    Args:
      scores: [..., n] float32, all entries >= 0 (0 = padded/invalid).
      k: static output size, k <= n.
    Returns:
      (values [..., k], indices [..., k]): exactly the k largest entries
      per row (ties at the k-th value resolved to lowest indices, matching
      lax.top_k's stable behavior), listed in ascending index order.
      Rows with fewer than k positive entries are completed with the
      smallest-index remaining entries (zeros), like a padded top_k.
    """
    n = scores.shape[-1]
    if k > n:
        # fail fast at the contract boundary — silently returning width n
        # would break static-shape callers far from the cause
        raise ValueError(f"exact_topk_set: k={k} > n={n}")
    if k == n:
        idx = jnp.broadcast_to(jnp.arange(n), scores.shape)
        return scores, idx
    lead = scores.shape[:-1]
    s = scores.reshape(-1, n)
    b = s.shape[0]
    bits = jax.lax.bitcast_convert_type(s, jnp.int32)  # >=0 floats: monotonic

    # smallest t with count(bits > t) < k  ==  k-th largest bit pattern
    def body(_, lohi):
        lo, hi = lohi
        # overflow-safe midpoint: lo + hi wraps int32 once hi reaches the
        # bit patterns of scores >= 2.0 (0x40000000+)
        mid = lo + ((hi - lo) >> 1)
        cnt = jnp.sum(bits > mid[:, None], axis=1)
        go_low = cnt < k
        return (jnp.where(go_low, lo, mid + 1), jnp.where(go_low, mid, hi))

    lo = jnp.zeros((b,), jnp.int32)
    hi = jnp.full((b,), jnp.int32(2**31 - 1))
    lo, hi = jax.lax.fori_loop(0, 31, body, (lo, hi))
    vk = lo[:, None]  # [b, 1] k-th largest bit pattern per row

    above = bits > vk
    c_above = jnp.sum(above, axis=1, keepdims=True)  # < k by construction
    ties = bits == vk
    tie_rank = jnp.cumsum(ties.astype(jnp.int32), axis=1)  # 1-based
    selected = above | (ties & (tie_rank <= (k - c_above)))

    # compact to k slots in index order: one scatter with unique positions
    pos = jnp.cumsum(selected.astype(jnp.int32), axis=1) - 1  # [b, n]
    pos = jnp.where(selected, pos, k)  # k = dropped
    idx_out = jnp.zeros((b, k), jnp.int32)
    row = jnp.broadcast_to(jnp.arange(b)[:, None], (b, n))
    # NOTE: no unique_indices promise — every non-selected entry shares the
    # dropped position k, and promising uniqueness there is UB territory
    idx_out = idx_out.at[row, pos].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n)),
        mode="drop",
    )
    val_out = jnp.take_along_axis(s, idx_out, axis=1)
    return val_out.reshape(lead + (k,)), idx_out.reshape(lead + (k,))
