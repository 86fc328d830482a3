"""Ephemerality / entropy motion scores (MODEST-style).

TPU-native equivalent of `compute_ephe_score` + the 15-frame neighbor
counting loop (`/root/reference/src/utils/pointcloud_utils.py:74-120`,
driven by `src/vilgod/zero_shot_detector.py:153-195`).

The reference holds a sliding window of N neighbor frames on the GPU and,
for each target frame, runs one ball query per window frame. Here the
window is a single padded array ``(W, P, 3)`` and the per-window-frame
counts are one vmapped radius-count — the whole entropy stage for a frame
is one jitted call.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .neighbors import radius_count


def entropy_from_counts(counts: jax.Array) -> jax.Array:
    """counts: (P, W) neighbor counts across W window frames -> (P,) score.

    H = -sum(P log P) / log(W), P = count / sum(count)
    (pointcloud_utils.py:107-114). Low score => ephemeral/moving.
    """
    w = counts.shape[1]
    total = jnp.sum(counts, axis=1, keepdims=True).astype(jnp.float32)
    p = counts.astype(jnp.float32) / (total + 1e-8)
    h = jnp.sum(-p * jnp.log(p + 1e-8), axis=1) / jnp.log(float(w))
    return h


@partial(jax.jit, static_argnames=("max_neighbor_points", "block_size", "exclude_self_frame"))
def entropy_scores_window(
    query: jax.Array,
    query_mask: jax.Array,
    window: jax.Array,
    window_mask: jax.Array,
    seek: jax.Array,
    radius: float = 0.3,
    max_neighbor_points: int = 1000,
    block_size: int = 4096,
    exclude_self_frame: bool = True,
) -> jax.Array:
    """Entropy scores of ``query`` (P, 3) against window (W, Pw, 3).

    ``seek`` is the index of the query frame inside the window: its own
    count excludes the query point itself (count_neighbors subtracts 1 for
    ``i == seek``, pointcloud_utils.py:89-90).
    """
    def one_frame(frame_pts, frame_mask, w_idx):
        c = radius_count(query, query_mask, frame_pts, frame_mask, radius,
                         max_count=max_neighbor_points + 1, block_size=block_size)
        if exclude_self_frame:
            c = jnp.where(w_idx == seek, jnp.maximum(c - 1, 0), c)
        return jnp.minimum(c, max_neighbor_points)

    counts = jax.vmap(one_frame, in_axes=(0, 0, 0))(
        window, window_mask, jnp.arange(window.shape[0])
    )  # (W, P)
    h = entropy_from_counts(counts.T)
    return jnp.where(query_mask, h, 1.0)


@partial(jax.jit, static_argnames=("window", "skip_frames", "radius",
                                   "max_neighbor_points", "block_size"))
def entropy_sequence(
    frames: jax.Array,
    masks: jax.Array,
    frame_valid: jax.Array,
    window: int = 15,
    skip_frames: int = 1,
    radius: float = 0.3,
    max_neighbor_points: int = 1000,
    block_size: int = 4096,
    data_frames: jax.Array | None = None,
    data_masks: jax.Array | None = None,
) -> jax.Array:
    """Entropy scores for a whole sequence in ONE device program.

    frames: (F, N, 3) world-frame non-ground clouds (device-resident);
    masks: (F, N); frame_valid: (F,) marks real frames (sequences are
    padded to bucketed lengths so one compile serves many lengths).
    ``data_frames``/``data_masks`` (F, Nd, 3)/(F, Nd), when given, replace
    the neighbor-window buffer (the ``include_ground_points`` option: the
    reference fills the window with the FULL world-frame cloud instead of
    the non-ground subset, zero_shot_detector.py:158-183); queries stay
    the non-ground points so scores keep their downstream index alignment.

    Window layout matches the reference exactly: window start
    ``clamp(f, 0, F_real - W)`` with every ``skip_frames + 1``-th frame
    sampled (zero_shot_detector.py:165-184, pointcloud_utils.py:74-81).

    Large clouds cell-sort every frame ONCE up front and run the W x F
    window counts as banded passes over the pre-sorted clouds (the sort
    amortizes over the ~W passes each frame participates in); overflowed
    windows fall back to the exact dense pass per pair.
    """
    f_total, n = frames.shape[:2]
    d_frames = frames if data_frames is None else data_frames
    d_masks = masks if data_masks is None else data_masks
    n_d = d_frames.shape[1]
    f_real = jnp.sum(frame_valid.astype(jnp.int32))
    w = min(window, f_total)
    skip = skip_frames + 1
    sampled = jnp.asarray(tuple(range(w))[::skip])

    from .banded import CELL, band_width, banded_radius_count, block_windows, sort_by_cell
    bandable = (isinstance(radius, (int, float)) and float(radius) < CELL
                and n >= 4096 and n % 2048 == 0
                and n_d >= 4096 and n_d % 2048 == 0)

    if bandable:
        from .pallas_kernels import TD, TQ, prep_t8

        # ONE origin for the whole sequence: every frame's cell ids are
        # compared against other frames' ids inside the window passes,
        # so all grids must align — and a per-sequence corner (unlike
        # the old world-fixed origin) keeps a travelling ego inside the
        # GRID extent (1024 m) instead of clamping late frames into
        # border cells and collapsing the bands.
        big = jnp.asarray(1e9, frames.dtype)
        mn = jnp.min(jnp.where(masks[..., None], frames[..., :2], big),
                     axis=(0, 1))
        if data_frames is not None:
            mn = jnp.minimum(mn, jnp.min(
                jnp.where(d_masks[..., None], d_frames[..., :2], big),
                axis=(0, 1)))
        mn = jnp.where(mn >= big, 0.0, mn)
        seq_origin = (jnp.floor(mn / CELL) - 1.0) * CELL

        def prep(f, pts, msk):
            order, cid = sort_by_cell(pts[f], msk[f], origin=seq_origin)
            t8 = prep_t8(pts[f][order], msk[f][order], 1)
            return t8, cid, order

        t8s, cids, orders = jax.lax.map(
            lambda f: prep(f, frames, masks), jnp.arange(f_total))
        if data_frames is None:
            d_t8s, d_cids = t8s, cids
        else:
            d_t8s, d_cids, _ = jax.lax.map(
                lambda f: prep(f, d_frames, d_masks), jnp.arange(f_total))
        w_band = band_width(n_d, tile=TD)
        tq = min(TQ, n)
        from .neighbors import radius2_threshold
        r2 = radius2_threshold(radius)

    def one_frame(fnr):
        start = jnp.clip(fnr, 0, jnp.maximum(f_real - w, 0))
        seek = fnr - start
        w_idx = jnp.clip(sampled + start, 0, f_total - 1)

        def count_one(s_idx):
            wf_i = w_idx[s_idx]
            if bandable:
                starts, ends, ovf = block_windows(cids[fnr], d_cids[wf_i],
                                                  tq, w_band)

                def count(starts_, w_, ends_):
                    c = banded_radius_count(t8s[fnr], d_t8s[wf_i], starts_,
                                            r2, tq, w_, ends=ends_)[:n]
                    c = jnp.zeros(n, jnp.int32).at[orders[fnr]].set(c)
                    return jnp.minimum(jnp.where(masks[fnr], c, 0),
                                       max_neighbor_points + 1)

                if w_band == n_d:
                    c = count(starts, w_band, ends)
                else:
                    # overflow fallback = the SAME banded scan at full
                    # width (identical arithmetic either way)
                    c = jax.lax.cond(
                        ovf,
                        lambda: count(jnp.zeros_like(starts), n_d, None),
                        lambda: count(starts, w_band, ends))
            else:
                c = radius_count(frames[fnr], masks[fnr], d_frames[wf_i],
                                 d_masks[wf_i], radius,
                                 max_count=max_neighbor_points + 1,
                                 block_size=block_size)
            c = jnp.where(sampled[s_idx] == seek, jnp.maximum(c - 1, 0), c)
            return jnp.minimum(c, max_neighbor_points)

        counts = jax.lax.map(count_one, jnp.arange(sampled.shape[0]))
        h = entropy_from_counts(counts.T)
        return jnp.where(masks[fnr], h, 1.0)

    return jax.lax.map(one_frame, jnp.arange(f_total))
