"""On-device linear assignment (Hungarian matching) via the auction algorithm.

The reference computes Hungarian matching with scipy's
``linear_sum_assignment`` on the CPU, forcing a device->host sync per image
per training step (reference third_party/Mask2Former/mask2former/modeling/
matcher.py:149-156) — one of the host sync points SURVEY.md section 3 flags
for elimination on TPU.

Here we solve the LAP entirely on device with a Jacobi (all-unassigned-bid)
auction algorithm [Bertsekas 1988], which vectorizes naturally on the VPU:
every round is a dense top-2 reduction over the benefit matrix plus scatter
updates, inside ``lax.while_loop``. With bidding increment ``eps``, the result
is within ``N * eps`` of optimal; for the matcher's purposes (cost scale ~10,
N=100, eps scaled to the cost range) this is indistinguishable from exact
matching, and ties may legitimately differ from scipy.

Static shapes only: rectangular problems are padded to square with dummy
columns; rows assigned to dummies are "unmatched".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["auction_lap", "linear_sum_assignment"]

_NEG = -1e30


def auction_lap(benefit: jnp.ndarray, eps: float | None = None,
                max_iters: int = 2000) -> jnp.ndarray:
    """Maximize sum(benefit[i, col[i]]) over permutations.

    Args:
      benefit: [N, N] square benefit matrix (float32 recommended).
      eps: bidding increment. Default: (range of benefit) * 1e-4 / N.
      max_iters: hard cap on auction rounds (safety for pathological ties).

    Returns:
      col_of_row: [N] int32, the object assigned to each row.
    """
    N = benefit.shape[0]
    assert benefit.shape == (N, N)
    benefit = benefit.astype(jnp.float32)
    if eps is None:
        rng = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-6)
        eps = rng * 1e-4 / N
    eps = jnp.asarray(eps, jnp.float32)

    def cond(state):
        _, _, obj_of_row, it = state
        return jnp.logical_and(jnp.any(obj_of_row < 0), it < max_iters)

    def body(state):
        price, owner, obj_of_row, it = state
        unassigned = obj_of_row < 0  # [N]

        vals = benefit - price[None, :]  # [N, N]
        top2_vals, top2_idx = jax.lax.top_k(vals, 2)
        best_j = top2_idx[:, 0]
        v1, v2 = top2_vals[:, 0], top2_vals[:, 1]
        bid_amt = jnp.take(price, best_j) + (v1 - v2) + eps  # [N]
        bid_amt = jnp.where(unassigned, bid_amt, _NEG)

        # winner per object: highest bid among persons whose best object is j
        bids = jnp.full((N, N), _NEG, jnp.float32)
        bids = bids.at[jnp.arange(N), best_j].set(bid_amt)  # person i bids on best_j[i]
        wbid = jnp.max(bids, axis=0)          # [N] per object
        winner = jnp.argmax(bids, axis=0)     # [N]
        has_bid = wbid > _NEG / 2

        # previous owners of re-auctioned objects become unassigned
        old_owner = owner
        lose_rows = jnp.where(has_bid & (old_owner >= 0), old_owner, N)
        obj_of_row = obj_of_row.at[lose_rows].set(-1, mode="drop")

        price = jnp.where(has_bid, wbid, price)
        owner = jnp.where(has_bid, winner, owner)
        # each person bids on exactly one object, so winners are distinct rows
        win_rows = jnp.where(has_bid, winner, N)
        obj_ids = jnp.arange(N, dtype=obj_of_row.dtype)
        obj_of_row = obj_of_row.at[win_rows].set(obj_ids, mode="drop")
        return price, owner, obj_of_row, it + 1

    price0 = jnp.zeros((N,), jnp.float32)
    owner0 = jnp.full((N,), -1, jnp.int32)
    obj0 = jnp.full((N,), -1, jnp.int32)
    _, _, obj_of_row, _ = jax.lax.while_loop(cond, body, (price0, owner0, obj0, 0))
    # If the iteration cap was hit (pathological ties), some rows may still be
    # unassigned: give leftover rows the unclaimed objects (any order) so the
    # output is always a valid permutation.
    claimed = jnp.zeros((N,), jnp.bool_).at[
        jnp.where(obj_of_row >= 0, obj_of_row, N)
    ].set(True, mode="drop")
    free_objs = jnp.argsort(claimed.astype(jnp.int32))  # unclaimed objects first
    needs = obj_of_row < 0
    order = jnp.argsort(jnp.logical_not(needs).astype(jnp.int32))  # needy rows first
    fill = jnp.zeros((N,), obj_of_row.dtype).at[order].set(free_objs)
    return jnp.where(needs, fill, obj_of_row)


def linear_sum_assignment(cost: jnp.ndarray, maximize: bool = False) -> jnp.ndarray:
    """scipy-compatible LAP on a rectangular [N, M] cost matrix, on device.

    Requires M <= N (queries >= targets, the Mask2Former case). Returns
    col_of_row [N] int32: for each row, the assigned column, or a value >= M
    when the row is matched to a dummy (unmatched).
    """
    N, M = cost.shape
    assert M <= N, "linear_sum_assignment requires cols <= rows (pad targets)"
    benefit = cost if maximize else -cost
    if M < N:
        lo = jnp.min(benefit) - 1.0
        pad = jnp.full((N, N - M), lo, benefit.dtype)
        benefit = jnp.concatenate([benefit, pad], axis=1)
    return auction_lap(benefit)
