"""Banded (cell-sorted) drivers for the pairwise-distance hot loops.

Every neighbor pass in the pipeline has a radius far below the scene
size (entropy 0.3 m, clustering eps_cap 0.3 m, label transfer 0.45 m
over 90-160 m scenes), yet the brute-force kernels compare every point
against every point. Here points are sorted ONCE by a coarse 2-D cell id
(row-major over 2 m cells); all neighbors of a query then live within
+-1 cell, i.e. inside a contiguous window of the sorted rank space. Each
query block scans only that window — typically 3-5x fewer pairs than the
full pass at bench scale, more at Waymo scale — with an exact full-pass
fallback selected on device when any window overflows the static band
width (no silently dropped edges, matching the round-1 design rule that
k-truncated neighbor graphs are not acceptable).

The band guarantee: two points within ``r < CELL`` of each other differ
by at most 1 in each cell coordinate, so candidates for a query cell
``c = cx * GRID + cy`` lie in ``[c - GRID - 1, c + GRID + 1]`` (row-major:
+-1 x-row is +-GRID ranks of cells, +-1 y within a row is +-1).

All distance math reuses the pallas tile kernels on TPU and the XLA
blockwise fallback elsewhere; this module only changes WHICH data each
query block sees.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Cell side (m): the band guarantee needs every radius < CELL, and the
# window cost scales with the points inside a ~2-cell-wide x-slab, so the
# tightest legal cell wins. The largest pipeline radius is the label
# transfer's sqrt(0.2) ~ 0.447 m (entropy 0.3, eps_cap 0.3) -> 0.5 m.
# Measured at bench scale (r4): median candidate span dropped ~4x vs the
# old CELL=2.0, cutting every banded pass (count3/min-label/nearest/
# transfer) proportionally.
CELL = 0.5
# Cells per axis. Cell coordinates are RELATIVE to a per-cloud origin
# (below), so GRID bounds the supported cloud EXTENT, not its world
# position: 2048 * 0.5 m = 1024 m covers a whole Waymo sequence's
# world-frame footprint (~600 m travel + 160 m sensor diameter). Points
# beyond the grid clamp into border cells — still CORRECT (clamping is a
# monotone contraction, so the +-1-cell window guarantee holds) but the
# bands collapse and every pass pays its full-width fallback: the r5
# 200-frame soak lost its TPU worker to exactly that, a world-fixed
# origin whose +-96 m grid the ego outran at frame ~160.
GRID = 2048
_INVALID_CID = GRID * GRID


def cell_origin(xy: jax.Array, mask: jax.Array) -> jax.Array:
    """Lattice-snapped lower corner of a cloud: the default ``origin``
    for :func:`cell_ids`. Snapping to the CELL lattice keeps cell
    boundaries aligned across clouds that share an origin."""
    big = jnp.asarray(1e9, xy.dtype)
    mn = jnp.min(jnp.where(mask[:, None], xy[:, :2], big), axis=0)
    mn = jnp.where(mn >= big, 0.0, mn)  # empty cloud
    return (jnp.floor(mn / CELL) - 1.0) * CELL


def page_origins(xy: jax.Array, mask: jax.Array, pages: jax.Array,
                 n_pages: int) -> jax.Array:
    """Per-page :func:`cell_origin` (n_pages, 2) for paged clouds."""
    big = jnp.asarray(1e9, xy.dtype)
    seg = jnp.where(mask, pages, n_pages)
    mins = jnp.full((n_pages + 1, 2), big, xy.dtype).at[seg].min(
        jnp.where(mask[:, None], xy[:, :2], big))[:n_pages]
    mins = jnp.where(mins >= big, 0.0, mins)
    return (jnp.floor(mins / CELL) - 1.0) * CELL


def cell_ids(xy: jax.Array, mask: jax.Array,
             origin: jax.Array | None = None) -> jax.Array:
    """Row-major 2-D cell id per point; invalid points sort last.

    ``origin`` ((2,) or per-point (N, 2)) anchors the grid. Clouds whose
    ids are compared against each other (query vs data windows) MUST
    share an origin; the default is this cloud's own corner."""
    if origin is None:
        origin = cell_origin(xy, mask)
    rel = xy[:, :2] - origin
    cx = jnp.clip(jnp.floor(rel[:, 0] / CELL).astype(jnp.int32), 0, GRID - 1)
    cy = jnp.clip(jnp.floor(rel[:, 1] / CELL).astype(jnp.int32), 0, GRID - 1)
    return jnp.where(mask, cx * GRID + cy, _INVALID_CID)


def sort_by_cell(points: jax.Array, mask: jax.Array,
                 origin: jax.Array | None = None):
    """Sort a cloud by cell id. Returns (order, cid_sorted)."""
    cid = cell_ids(points[:, :2], mask, origin=origin)
    order = jnp.argsort(cid).astype(jnp.int32)
    return order, cid[order]


def block_windows(cid_q_sorted: jax.Array, cid_d_sorted: jax.Array,
                  tq: int, w_band: int, invalid_cid: int = _INVALID_CID):
    """Per query block of ``tq`` sorted points: the start of a
    ``w_band``-wide window of sorted data ranks guaranteed to contain
    every data point within +-1 cell of any valid query in the block.

    ``invalid_cid`` marks masked points (paged cell ids from
    ``dbscan_labels_paged`` exceed one grid's GRID^2, so the sentinel
    must come from the caller there).

    Returns (starts (NB,) int32, ends (NB,) int32, overflow scalar
    bool). ``[starts[b], ends[b])`` is block b's TRUE candidate span
    (ends == starts for all-invalid blocks); the single-launch kernels
    use it to skip tiles past the span. When ``overflow`` is True some
    block's span exceeds ``w_band`` and the caller must use its
    full-pass fallback.
    """
    n_q = cid_q_sorted.shape[0]
    nb = n_q // tq
    blocks = cid_q_sorted.reshape(nb, tq)
    valid = blocks < invalid_cid
    lo_cid = jnp.min(jnp.where(valid, blocks, invalid_cid), axis=1) - GRID - 1
    hi_cid = jnp.max(jnp.where(valid, blocks, -1), axis=1) + GRID + 1
    lo = jnp.searchsorted(cid_d_sorted, lo_cid).astype(jnp.int32)
    hi = jnp.searchsorted(cid_d_sorted, hi_cid, side="right").astype(jnp.int32)
    any_valid = jnp.any(valid, axis=1)
    width = jnp.where(any_valid, hi - lo, 0)
    n_d = cid_d_sorted.shape[0]
    starts = jnp.clip(lo, 0, max(n_d - w_band, 0))
    ends = jnp.where(any_valid, hi, starts)
    overflow = jnp.any(width > w_band)
    return starts, ends, overflow


def band_width(n_data: int, tile: int = 2048, frac: int = 8,
               floor: int = 4096) -> int:
    """Static band width: n/frac rounded to a tile multiple (>= floor).
    frac=8 holds ~2x margin over the spans CELL=0.5 realizes at bench
    scale; overflow falls back to the exact full pass, so the margin
    trades a little skipped-step overhead for not paying O(n*d)."""
    w = max(floor, n_data // frac)
    w = -(-w // tile) * tile
    return min(w, -(-n_data // tile) * tile)


def banded_scan(q_t8: jax.Array, d_t8: jax.Array, starts: jax.Array,
                tq: int, w_band: int, inner):
    """Scan query blocks against their data windows.

    q_t8/d_t8: (8, N) transposed sentinel-masked clouds (prep_t8 layout);
    inner(q_block (8, tq), d_window (8, w_band), start) -> pytree of
    (tq, ...) outputs. Returns the pytree with leading axis N (sorted
    query order).
    """
    nb = q_t8.shape[1] // tq

    def body(_, b):
        qb = jax.lax.dynamic_slice(q_t8, (0, b * tq), (8, tq))
        db = jax.lax.dynamic_slice(d_t8, (0, starts[b]), (8, w_band))
        return None, inner(qb, db, starts[b])

    _, outs = jax.lax.scan(body, None, jnp.arange(nb))
    return jax.tree.map(
        lambda a: a.reshape((nb * tq,) + a.shape[2:]), outs)


# ---------------------------------------------------------------------------
# XLA fallback inners (CPU / VILGOD_NO_PALLAS): direct masked tile math
# ---------------------------------------------------------------------------

def _dist2_t8(q_t8, d_t8, ndim):
    acc = None
    for c in range(ndim):
        diff = q_t8[c][:, None] - d_t8[c][None, :]
        acc = diff * diff if acc is None else acc + diff * diff
    return acc


def _xla_count(q_t8, d_t8, r2, ndim):
    dist2 = _dist2_t8(q_t8, d_t8, ndim)
    return jnp.sum((dist2 <= r2).astype(jnp.int32), axis=1)


def _xla_count3(q_t8, d_t8, levels2, ndim):
    dist2 = _dist2_t8(q_t8, d_t8, ndim)
    return jnp.sum((dist2[..., None] <= levels2[None, None, :]).astype(jnp.int32),
                   axis=1)


def _xla_min_label(q_t8, d_t8, qr2, dr2, lab, ndim, big):
    dist2 = _dist2_t8(q_t8, d_t8, ndim)
    # max-radius joint = HDBSCAN mutual-reachability linkage (see cluster.py)
    joint = jnp.maximum(qr2[:, None], dr2[None, :])
    cand = jnp.where(dist2 <= joint, lab[None, :], big)
    return jnp.min(cand, axis=1)


def _xla_nearest(q_t8, d_t8, ndim):
    dist2 = _dist2_t8(q_t8, d_t8, ndim)
    return jnp.min(dist2, axis=1), jnp.argmin(dist2, axis=1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# banded ops over PRE-SORTED clouds
# ---------------------------------------------------------------------------
# All functions take clouds already in cell-sorted order (the caller owns
# the sort so it amortizes across passes) plus the per-block window
# starts; returned arrays follow the sorted query order. Each has an
# exact full-pass twin used via lax.cond on window overflow.

def _use_pallas():
    from .neighbors import _use_pallas as f
    return f()


def _starts_to_tiles(starts, ends, n_d: int, w_band: int):
    """Rank-space window spans -> packed (2, NB) int32 of (start tile,
    true width in tiles) plus the static tile count.

    The single-launch kernels round each window start DOWN to a TD tile
    boundary, so the tile window must be one tile wider than ``w_band``
    to keep the block_windows coverage guarantee. Row 1 carries each
    block's TRUE span in tiles (``ends=None`` -> the full static band):
    the kernel skips compute for grid steps past it, so pass cost
    follows the scene's real candidate spans, not the static band."""
    from .pallas_kernels import TD

    n_tiles = n_d // TD
    n_d_tiles = min(w_band // TD + 1, n_tiles)
    starts_tile = jnp.clip(starts // TD, 0, max(n_tiles - n_d_tiles, 0)
                           ).astype(jnp.int32)
    if ends is None:
        width_tiles = jnp.full_like(starts_tile, n_d_tiles)
    else:
        width_tiles = jnp.clip(-(-(ends - starts_tile * TD) // TD),
                               0, n_d_tiles).astype(jnp.int32)
    return jnp.stack([starts_tile, width_tiles]), n_d_tiles


def banded_radius_count(q_t8, d_t8, starts, r2, tq: int, w_band: int,
                        ndim: int = 3, ends=None):
    if _use_pallas():
        from .pallas_kernels import banded_tile_count
        sw, n_d_tiles = _starts_to_tiles(starts, ends, d_t8.shape[1],
                                         w_band)
        return banded_tile_count(q_t8, d_t8, sw, r2, n_d_tiles,
                                 tq=tq, ndim=ndim)

    def inner(qb, db, _):
        return _xla_count(qb, db, jnp.asarray(r2, jnp.float32), ndim)

    return banded_scan(q_t8, d_t8, starts, tq, w_band, inner)


def banded_radius_count3(q_t8, d_t8, starts, levels2, tq: int, w_band: int,
                         ndim: int = 3, ends=None):
    if _use_pallas():
        from .pallas_kernels import banded_tile_count3
        sw, n_d_tiles = _starts_to_tiles(starts, ends, d_t8.shape[1],
                                         w_band)
        return banded_tile_count3(q_t8, d_t8, sw, levels2,
                                  n_d_tiles, tq=tq, ndim=ndim)

    def inner(qb, db, _):
        return _xla_count3(qb, db, jnp.asarray(levels2, jnp.float32), ndim)

    return banded_scan(q_t8, d_t8, starts, tq, w_band, inner)


def banded_min_label(pts_t8, radius2_row, labels_row, starts, tq: int,
                     w_band: int, ndim: int, big: int, ends=None):
    """One min-label propagation pass over the sorted core cloud.
    radius2_row/labels_row: (N,) float32 aligned with pts_t8 lanes."""
    # the Pallas tiles carry labels as float32 lanes — exact only below
    # 2**24; label values are flattened point indices (or the 2**30
    # non-core sentinel, representable exactly), so the point count is
    # the binding limit. Today's caps top out ~2.1M flattened points;
    # fail loudly instead of silently corrupting labels if a future
    # config scales pages/caps past 16.7M.
    assert pts_t8.shape[1] < 2 ** 24, (
        f"banded_min_label: {pts_t8.shape[1]} points exceeds the float32 "
        "label-lane exactness limit (2**24); split into more pages")
    if _use_pallas():
        from .pallas_kernels import banded_tile_min_label
        sw, n_d_tiles = _starts_to_tiles(starts, ends, pts_t8.shape[1],
                                         w_band)
        return banded_tile_min_label(pts_t8, radius2_row, labels_row,
                                     sw, n_d_tiles, tq=tq,
                                     ndim=ndim)

    nb = pts_t8.shape[1] // tq

    def body(_, b):
        qb = jax.lax.dynamic_slice(pts_t8, (0, b * tq), (8, tq))
        db = jax.lax.dynamic_slice(pts_t8, (0, starts[b]), (8, w_band))
        qr2 = jax.lax.dynamic_slice(radius2_row, (b * tq,), (tq,))
        dr2 = jax.lax.dynamic_slice(radius2_row, (starts[b],), (w_band,))
        lab = jax.lax.dynamic_slice(labels_row, (starts[b],), (w_band,))
        best = _xla_min_label(qb, db, qr2, dr2, lab, ndim,
                              jnp.asarray(big, labels_row.dtype))
        return None, best

    _, outs = jax.lax.scan(body, None, jnp.arange(nb))
    return outs.reshape(nb * tq)


def banded_nearest(q_t8, d_t8, starts, tq: int, w_band: int, ndim: int = 3,
                   ends=None):
    """Nearest data point per query WITHIN the band. Exact for every
    consumer that thresholds the result at a radius < CELL (border
    attachment, kNN label transfer): any point outside the band is
    farther than the threshold by the band guarantee."""
    # nearest indices ride float32 lanes in the Pallas tile (see
    # banded_min_label): exact only for data indices < 2**24
    assert d_t8.shape[1] < 2 ** 24, (
        f"banded_nearest: {d_t8.shape[1]} data points exceeds the float32 "
        "index-lane exactness limit (2**24); split into more pages")
    if _use_pallas():
        from .pallas_kernels import banded_tile_nearest
        sw, n_d_tiles = _starts_to_tiles(starts, ends, d_t8.shape[1],
                                         w_band)
        return banded_tile_nearest(q_t8, d_t8, sw, n_d_tiles,
                                   tq=tq, ndim=ndim)

    def inner(qb, db, start):
        bd, bi = _xla_nearest(qb, db, ndim)
        return bd, bi + start

    return banded_scan(q_t8, d_t8, starts, tq, w_band, inner)
