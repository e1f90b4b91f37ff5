"""Exact top-k SET selection without a variadic sort (TPU-native).

The reference decode takes exact per-level top-k (dafne_outputs.py:824-858,
torch.topk).  On TPU, `jax.lax.top_k` with k ~ n/2 of ~10k, or k=2000 of
~250k, lowers to a full variadic sort — the degenerate case (measured
~20 ms/batch, PROFILE_TRAIN.json round 2), which is why the decode
originally shipped with `lax.approx_max_k` (recall 0.99).  This module
provides the EXACT top-k that is now the decode DEFAULT — isolated decode
chain 9.7 ms vs approx's 11.4; +1.3 ms (+2.9%) in the full eval program
(PROFILE_TRAIN.json round 3) — with TPU-friendly primitives only:

  1. bitcast the non-negative f32 scores to int32 (order-isomorphic),
  2. radix-select the k-th largest bit pattern: 8 rounds over 4-bit digits
     (MSB first), each one fused 16-bin histogram (compare + row-sum) —
     pure elementwise/reduce work, no sort.  This replaced a 31-iteration
     bitwise bisection: the search is latency-bound (every step is a tiny
     reduce with a sequential dependency), so cutting the depth 31 -> 8
     is the win; the per-round histogram does 16 masked compares instead
     of 1, which is still bandwidth-trivial next to the model,
  3. select `score > v_k` plus the first (k - count) ties in index order
     (exactly `lax.top_k`'s stable tie-break set),
  4. compact selected indices into k slots scatter-free: per-block cumsums
     locate the j-th selected element with two tiny counting reductions and
     one contiguous block gather.  (A [b,n]->[b,k] scatter here measured
     10 ms at the P3 decode shape — tools/topk_microbench.py — because TPU
     scatter serializes; the hierarchical compaction is ~0.3 ms.)

The returned SET equals `jax.lax.top_k`'s exactly; the returned ORDER is
ascending-index rather than descending-score.  Decode does not depend on
candidate order (NMS re-sorts class-major internally; the post-NMS top-k
re-orders the output), so set-equality is sufficient there — asserted by
tests/test_topk.py against lax.top_k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def radix_select_kth(bits: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-th largest bit pattern per row of non-negative int32 `bits` [b, n].

    Radix select, one 4-bit digit per round (MSB first).  Invariants
    entering each round: `prefix` holds the already-fixed high digits (low
    digits zero), `need` is the rank of the target within the active set
    {bits whose high digits == prefix}, and 1 <= need <= |active|.  An
    element is active with current digit j iff
    (bits >> shift) == (prefix >> shift) + j, which folds the active test
    and the digit compare into one equality.  Returns [b, 1].

    Shared by exact_topk_set and tools/topk_microbench.py (the stage
    attribution must time the SHIPPED search, not a copy)."""
    b = bits.shape[0]
    prefix = jnp.zeros((b,), jnp.int32)
    need = jnp.full((b,), k, jnp.int32)
    digits = jnp.arange(16, dtype=jnp.int32)
    for shift in range(28, -1, -4):
        want = (prefix >> shift)[:, None] + digits  # [b, 16]
        hist = jnp.sum(
            (bits >> shift)[:, None, :] == want[:, :, None], axis=2
        )  # [b, 16]: active-element count per candidate digit
        cum = jnp.cumsum(hist, axis=1)  # inclusive, digit-ascending
        total = cum[:, -1:]
        cnt_ge = total - cum + hist  # [b, 16]: actives with digit >= j
        # target digit = max j with cnt_ge[j] >= need; cnt_ge is
        # non-increasing in j so the comparison mask is a prefix of ones
        j_star = jnp.sum((cnt_ge >= need[:, None]).astype(jnp.int32), axis=1) - 1
        # actives with digit > j_star (== cnt_ge[j_star + 1], gathered
        # tiny-minor-dim-free via a one-hot sum)
        one_hot = digits[None, :] == j_star[:, None]
        cnt_gt = jnp.sum(jnp.where(one_hot, total - cum, 0), axis=1)
        prefix = prefix | (j_star << shift)
        need = need - cnt_gt
    return prefix[:, None]


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
    vk = radix_select_kth(bits, k)  # [b, 1] k-th largest bit pattern per row

    above = bits > vk
    c_above = jnp.sum(above, axis=1, keepdims=True)  # < k by construction
    ties = bits == vk

    # Exactly k entries are selected per row (vk is the k-th largest
    # pattern, zeros included): everything above vk plus the first
    # (k - c_above) ties in index order.  Compact their indices into k
    # slots hierarchically over 512-wide blocks — cumsums stay short and
    # minor-axis local, and the per-row compaction needs no scatter.
    blk = 512
    pad = -n % blk
    if pad:
        zpad = ((0, 0), (0, pad))
        above = jnp.pad(above, zpad)
        ties = jnp.pad(ties, zpad)
    nb = (n + pad) // blk
    t3 = ties.reshape(b, nb, blk)
    tie_local = jnp.cumsum(t3.astype(jnp.int32), axis=2)  # 1-based in block
    tie_blk = tie_local[:, :, -1]
    tie_off = jnp.cumsum(tie_blk, axis=1) - tie_blk  # exclusive block offset
    tie_rank = (tie_local + tie_off[:, :, None]).reshape(b, nb * blk)
    selected = above | (ties.reshape(b, nb * blk) & (tie_rank <= (k - c_above)))

    s3 = selected.reshape(b, nb, blk)
    loc_cum = jnp.cumsum(s3.astype(jnp.int32), axis=2)  # [b, nb, blk]
    blk_cnt = loc_cum[:, :, -1]
    blk_end = jnp.cumsum(blk_cnt, axis=1)  # selected count through block m
    j1 = jnp.arange(1, k + 1, dtype=jnp.int32)  # target ranks, 1-based
    # block holding the j-th selected element = first m with blk_end >= j
    blk_of = jnp.sum(
        (blk_end[:, None, :] < j1[None, :, None]).astype(jnp.int32), axis=2
    )  # [b, k], < nb since every row selects exactly k
    blk_start = blk_end - blk_cnt
    r = j1[None, :] - jnp.take_along_axis(blk_start, blk_of, axis=1)  # [b, k]
    rows = jnp.take_along_axis(loc_cum, blk_of[:, :, None], axis=1)  # [b,k,blk]
    in_blk = jnp.sum((rows < r[:, :, None]).astype(jnp.int32), axis=2)
    idx_out = blk_of * blk + in_blk  # ascending (j-th selected, in order)
    val_out = jnp.take_along_axis(s, idx_out, axis=1)
    return val_out.reshape(lead + (k,)), idx_out.reshape(lead + (k,))
