"""Neighbor search kernels: radius counting and brute-force kNN.

TPU-native equivalents of the reference's CUDA neighbor ops:
- `pointnet2_stack.ball_query`-based neighbor counting
  (`/root/reference/src/utils/pointcloud_utils.py:74-104`) — here a tiled
  masked pairwise-distance count (the MXU does the inner products, the
  VPU does the compare+accumulate), no index lists materialized since the
  pipeline only consumes *counts*;
- `pytorch3d.ops.knn_points` (`pointcloud_utils.py:496-513`) — tiled
  brute-force top-k over chunked distance blocks.

All functions take validity masks; invalid points neither count as
neighbors nor receive meaningful outputs.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _use_pallas() -> bool:
    """Trace-time switch: fused VMEM tile kernels on real TPUs, the
    blockwise XLA path elsewhere (CPU tests, virtual meshes). Disable
    with VILGOD_NO_PALLAS=1."""
    if os.environ.get("VILGOD_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _sq_dists(query: jax.Array, data: jax.Array) -> jax.Array:
    """(Q, 3), (D, 3) -> (Q, D) squared euclidean distances via MXU.

    The cross term runs at bf16x3 (Precision.HIGH): the TPU default
    single-pass bf16 injects dist^2 errors ~0.1 at LiDAR coordinate
    magnitudes — larger than the pipeline's eps^2 = 0.0225 thresholds,
    silently randomizing neighbor counts and cluster connectivity.
    bf16x3 keeps the error ~1e-3 (compare: the reference's f32 CUDA has
    ~1e-4 fuzz) at ~2x the speed of full f32 emulation.
    """
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)  # (Q, 1)
    d2 = jnp.sum(data * data, axis=-1, keepdims=True).T  # (1, D)
    cross = jax.lax.dot_general(query, data.T, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGH)
    return jnp.maximum(q2 + d2 - 2.0 * cross, 0.0)


def radius2_threshold(radius) -> float:
    """The ONE squared-radius threshold every neighbor pass must use.

    Computed in f64 then rounded to f32 once, nudged up by HALF a
    lattice step: the raw cloud is quantized to a 5 mm lattice, so
    squared distances land on exact multiples of 2.5e-5 — many pairs
    sit EXACTLY on thresholds like 0.3^2, where a 1-ULP difference
    between ``f32(r)**2`` and ``f32(r*r)`` (or per-graph FMA
    contraction) makes equally valid implementations disagree by +-1
    count. The +1.25e-5 absolute nudge puts the threshold mid-gap for
    EVERY radius (a relative nudge can land back on the lattice, e.g.
    0.5^2 * 1e-4 = exactly one step), far above f32 rounding, so every
    code path (dense, banded, pallas, sharded) resolves boundary pairs
    identically."""
    return float(np.float32(np.float64(radius) ** 2 + 1.25e-5))


def _bandable(nq: int, nd: int, radius) -> bool:
    """Static check: the banded cell-sorted path applies (big pow2-ish
    buffers, compile-time radius below the cell side)."""
    from .banded import CELL
    return (isinstance(radius, (int, float)) and float(radius) < CELL
            and nq >= 4096 and nd >= 4096
            and nq % 1024 == 0 and nd % 2048 == 0)


def _radius_count_banded(query, query_mask, data, data_mask, radius,
                         max_count):
    """Cell-sorted banded radius count. The overflow fallback is the SAME
    banded scan at full window width — identical arithmetic, so whether a
    scene overflows cannot change a single count."""
    from .banded import (band_width, banded_radius_count, block_windows,
                         cell_origin, sort_by_cell)
    from .pallas_kernels import TD, TQ, prep_t8

    nq, nd = query.shape[0], data.shape[0]
    # cross-cloud windows compare cell ids -> both grids MUST share an
    # origin (the union corner)
    og = jnp.minimum(cell_origin(query[:, :2], query_mask),
                     cell_origin(data[:, :2], data_mask))
    oq, cq = sort_by_cell(query[:, :3], query_mask, origin=og)
    od, cd = sort_by_cell(data[:, :3], data_mask, origin=og)
    q_t8 = prep_t8(query[oq, :3], query_mask[oq], 1)
    d_t8 = prep_t8(data[od, :3], data_mask[od], 1)
    tq = min(TQ, nq)
    w_band = band_width(nd, tile=TD)
    starts, ends, ovf = block_windows(cq, cd, tq, w_band)
    r2 = radius2_threshold(radius)

    def unsort(c):
        c = jnp.zeros(nq, jnp.int32).at[oq].set(c[:nq])
        return jnp.minimum(jnp.where(query_mask, c, 0), max_count)

    w_full = -(-nd // TD) * TD

    def banded():
        return unsort(banded_radius_count(q_t8, d_t8, starts, r2, tq, w_band,
                                          ends=ends))

    def full():
        zeros = jnp.zeros_like(starts)
        return unsort(banded_radius_count(q_t8, d_t8, zeros, r2, tq, w_full))

    if w_full == w_band:
        return banded()
    return jax.lax.cond(ovf, full, banded)


@partial(jax.jit, static_argnames=("radius", "max_count", "block_size"))
def radius_count(
    query: jax.Array,
    query_mask: jax.Array,
    data: jax.Array,
    data_mask: jax.Array,
    radius: float,
    max_count: int = 1000,
    block_size: int = 4096,
) -> jax.Array:
    """Count data points within ``radius`` of each query point.

    Matches the reference's ball-query count semantics
    (pointcloud_utils.py:74-94): counts are clipped at ``max_count`` (the
    CUDA kernel stops filling its K-slot index buffer), and the point
    itself is *excluded* when query and data are the same cloud (callers
    pass ``exclude_self`` via subtracting later — here we simply count all
    data points within r; use :func:`radius_count_self` for self-counts).

    Large clouds take the cell-sorted banded path (ops/banded.py) with an
    exact full-pass fallback chosen on device if a band overflows.

    query: (Q, 3); data: (D, 3). Returns int32 (Q,).
    """
    if _bandable(query.shape[0], data.shape[0], radius):
        return _radius_count_banded(query, query_mask, data, data_mask,
                                    radius, max_count)
    return _radius_count_dense(query, query_mask, data, data_mask, radius,
                               max_count, block_size)


def _radius_count_dense(query, query_mask, data, data_mask, radius,
                        max_count, block_size):
    r2 = (radius2_threshold(radius) if isinstance(radius, (int, float))
          else jnp.asarray(radius, query.dtype) ** 2)
    if _use_pallas():
        from .pallas_kernels import TD, TQ, prep_t8, tile_radius_count
        qt = prep_t8(query[:, :3], query_mask, TQ)
        dt = prep_t8(data[:, :3], data_mask, TD)
        counts = tile_radius_count(qt, dt, r2)[: query.shape[0]]
        counts = jnp.where(query_mask, counts, 0)
        return jnp.minimum(counts, max_count)
    n_blocks = -(-data.shape[0] // block_size)
    pad = n_blocks * block_size - data.shape[0]
    data_p = jnp.pad(data, ((0, pad), (0, 0)))
    mask_p = jnp.pad(data_mask, (0, pad))
    data_b = data_p.reshape(n_blocks, block_size, 3)
    mask_b = mask_p.reshape(n_blocks, block_size)

    def body(carry, blk):
        d, m = blk
        dist2 = _sq_dists(query, d)
        hits = jnp.sum((dist2 <= r2) & m[None, :], axis=1, dtype=jnp.int32)
        return carry + hits, None

    # init derives from `query` so its varying-axis type matches the body
    # output under shard_map manual axes (scan carry typing rule)
    init = jnp.zeros_like(query[:, 0], dtype=jnp.int32)
    counts, _ = jax.lax.scan(body, init, (data_b, mask_b))
    counts = jnp.where(query_mask, counts, 0)
    return jnp.minimum(counts, max_count)


def radius_count_self(points: jax.Array, mask: jax.Array, radius: float,
                      max_count: int = 1000, block_size: int = 4096) -> jax.Array:
    """Self-neighbor counts, excluding the point itself
    (count_neighbors_inter_frame semantics, pointcloud_utils.py:97-104)."""
    c = radius_count(points, mask, points, mask, radius, max_count + 1, block_size)
    return jnp.minimum(jnp.maximum(c - 1, 0), max_count)


@partial(jax.jit, static_argnames=("k", "block_size"))
def knn(
    query: jax.Array,
    query_mask: jax.Array,
    data: jax.Array,
    data_mask: jax.Array,
    k: int = 1,
    block_size: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """Brute-force kNN: (Q, 3) vs (D, 3) -> (dists (Q, k), idx (Q, k)).

    Squared distances, matching pytorch3d ``knn_points`` (which the
    reference consumes squared, e.g. the 0.2 threshold at
    pointcloud_utils.py:505-513 is applied to squared dists).
    Invalid data points are pushed to +inf; invalid queries return +inf.
    """
    n_blocks = -(-data.shape[0] // block_size)
    pad = n_blocks * block_size - data.shape[0]
    data_p = jnp.pad(data, ((0, pad), (0, 0)))
    mask_p = jnp.pad(data_mask, (0, pad))
    data_b = data_p.reshape(n_blocks, block_size, 3)
    mask_b = mask_p.reshape(n_blocks, block_size)

    init_d = jnp.full((query.shape[0], k), jnp.inf, query.dtype)
    init_i = jnp.zeros((query.shape[0], k), jnp.int32)

    if k == 1 and _use_pallas():
        from .pallas_kernels import TD, TQ, prep_t8, tile_nearest
        qt = prep_t8(query[:, :3], query_mask, TQ)
        dt = prep_t8(data[:, :3], data_mask, TD)
        bd, bi = tile_nearest(qt, dt)
        bd = bd[: query.shape[0]]
        bi = jnp.minimum(bi[: query.shape[0]], data.shape[0] - 1)
        bd = jnp.where(query_mask, bd, jnp.inf)
        return bd[:, None], bi[:, None]

    if k == 1:
        # nearest-neighbor fast path: running min/argmin instead of
        # top_k (TPU top_k is sort-bound on the VPU; min reductions fuse)
        def body1(carry, blk_with_idx):
            best_d, best_i = carry
            (d, m), blk_idx = blk_with_idx
            dist2 = _sq_dists(query, d)
            dist2 = jnp.where(m[None, :], dist2, jnp.inf)
            bd = jnp.min(dist2, axis=1)
            bi = jnp.argmin(dist2, axis=1).astype(jnp.int32) + blk_idx * block_size
            take = bd < best_d[:, 0]
            return (jnp.where(take, bd, best_d[:, 0])[:, None],
                    jnp.where(take, bi, best_i[:, 0])[:, None]), None

        (dists, idx), _ = jax.lax.scan(
            body1, (init_d, init_i), ((data_b, mask_b), jnp.arange(n_blocks)))
        dists = jnp.where(query_mask[:, None], dists, jnp.inf)
        return dists, idx

    def body(carry, blk_with_idx):
        best_d, best_i = carry
        (d, m), blk_idx = blk_with_idx
        dist2 = _sq_dists(query, d)
        dist2 = jnp.where(m[None, :], dist2, jnp.inf)
        blk_d, blk_local = jax.lax.top_k(-dist2, k)
        blk_d = -blk_d
        blk_i = blk_local + blk_idx * block_size
        # merge two sorted k-lists
        cat_d = jnp.concatenate([best_d, blk_d], axis=1)
        cat_i = jnp.concatenate([best_i, blk_i], axis=1)
        merged_d, sel = jax.lax.top_k(-cat_d, k)
        merged_d = -merged_d
        merged_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (merged_d, merged_i), None

    (dists, idx), _ = jax.lax.scan(
        body, (init_d, init_i), ((data_b, mask_b), jnp.arange(n_blocks))
    )
    dists = jnp.where(query_mask[:, None], dists, jnp.inf)
    return dists, idx


def knn_labels(
    query: jax.Array,
    query_mask: jax.Array,
    data: jax.Array,
    data_mask: jax.Array,
    labels: jax.Array,
    probabilities: jax.Array | None = None,
    dist_threshold: float = 0.2,
) -> tuple[jax.Array, jax.Array | None]:
    """Nearest-neighbor label transfer with distance cutoff
    (pointcloud_utils.py:505-513): label -1 beyond ``dist_threshold``
    (threshold applied to squared distance, as in the reference).

    Large clouds use the banded nearest pass: it is exact here because
    any nearest neighbor outside the band is farther than
    ``sqrt(dist_threshold) < CELL`` and would be cut off anyway."""
    bandable = (_bandable(query.shape[0], data.shape[0],
                          float(np.sqrt(dist_threshold)))
                if isinstance(dist_threshold, (int, float)) else False)
    if bandable:
        from .banded import (band_width, banded_nearest, block_windows,
                             cell_origin, sort_by_cell)
        from .pallas_kernels import TD, TQ, prep_t8

        nq, nd = query.shape[0], data.shape[0]
        og = jnp.minimum(cell_origin(query[:, :2], query_mask),
                         cell_origin(data[:, :2], data_mask))
        oq, cq = sort_by_cell(query[:, :3], query_mask, origin=og)
        od, cd = sort_by_cell(data[:, :3], data_mask, origin=og)
        q_t8 = prep_t8(query[oq, :3], query_mask[oq], 1)
        d_t8 = prep_t8(data[od, :3], data_mask[od], 1)
        tq = min(TQ, nq)
        w_band = band_width(nd, tile=TD)
        starts, ends, ovf = block_windows(cq, cd, tq, w_band)

        def banded():
            bd, bi = banded_nearest(q_t8, d_t8, starts, tq, w_band, ends=ends)
            bd, bi = bd[:nq], jnp.minimum(bi[:nq], nd - 1)
            # back to original orders: query rank -> original query row,
            # data rank -> original data row
            d2 = jnp.zeros(nq, jnp.float32).at[oq].set(bd)
            di = jnp.zeros(nq, jnp.int32).at[oq].set(od[bi])
            return d2, di

        def full():
            dists, idx = knn(query, query_mask, data, data_mask, k=1)
            return dists[:, 0].astype(jnp.float32), idx[:, 0]

        d2, idx0 = jax.lax.cond(ovf, full, banded)
    else:
        dists, idx = knn(query, query_mask, data, data_mask, k=1)
        d2, idx0 = dists[:, 0], idx[:, 0]
    thr = (float(np.float32(np.float64(dist_threshold) + 1.25e-5))
           if isinstance(dist_threshold, (int, float)) else dist_threshold)
    point_labels = labels[idx0]
    point_labels = jnp.where(d2 > thr, -1, point_labels)
    point_labels = jnp.where(query_mask, point_labels, -1)
    # probabilities only travel with a transferred label: beyond the
    # cutoff the "nearest" is whatever the (banded) pass happened to see
    # — a band-composition-dependent garbage value no consumer may read
    # (the pipeline masks by probability only where labels >= 0)
    point_probs = (jnp.where(point_labels >= 0, probabilities[idx0], 0.0)
                   if probabilities is not None else None)
    return point_labels, point_probs


def knn_labels_paged(
    query: jax.Array,
    query_mask: jax.Array,
    q_pages: jax.Array,
    data: jax.Array,
    data_mask: jax.Array,
    d_pages: jax.Array,
    n_pages: int,
    labels: jax.Array,
    probabilities: jax.Array | None = None,
    dist_threshold: float = 0.2,
    d_presorted: tuple | None = None,
    origins: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array | None]:
    """:func:`knn_labels` over MANY independent page pairs in ONE pass.

    Query page p transfers labels only from data page p: both clouds
    sort by a paged cell id (page * GRID^2 + cell) so banded windows
    cannot cross the page gap, and a 4th ``page * PAGE_ISO`` coordinate
    keeps pages unreachable by distance even in the full fallback. One
    launch replaces ``n_pages`` per-frame transfers — on the tunneled
    axon runtime the per-call/per-op dispatch overhead dominates these
    small passes, so batching pages is the whole win.

    ``origins`` (n_pages, 2): per-page cell-grid origin shared by the
    query and data grids. When ``d_presorted`` comes from
    ``paged_cell_sort``, pass the SAME origins that sort used — the
    window search compares query cell ids against the presorted data
    ids. Default: the per-page union corner of both clouds."""
    from .banded import (GRID, band_width, banded_nearest, block_windows,
                         cell_ids, page_origins)
    from .cluster import PAGE_ISO
    from .pallas_kernels import TD, TQ, prep_t8

    nq, nd = query.shape[0], data.shape[0]
    # entry-point shape guards (mirror _bandable): a non-multiple size
    # would otherwise fail deep inside block_windows with an opaque error
    assert nq % TQ == 0 and nd % TD == 0, (
        f"knn_labels_paged: flattened sizes (nq={nq}, nd={nd}) must be "
        f"multiples of (TQ={TQ}, TD={TD}); pad the page capacity")
    if origins is None:
        assert d_presorted is None, (
            "knn_labels_paged: a presorted data cloud requires the origins "
            "its sort used (cell ids must share the grid)")
        origins = jnp.minimum(
            page_origins(query[:, :2], query_mask, q_pages, n_pages),
            page_origins(data[:, :2], data_mask, d_pages, n_pages))
    page_span = GRID * GRID
    invalid = n_pages * page_span
    cq = jnp.where(query_mask,
                   q_pages * page_span + cell_ids(query[:, :2], query_mask,
                                                  origin=origins[q_pages]),
                   invalid)
    oq = jnp.argsort(cq).astype(jnp.int32)
    if d_presorted is None:
        cd = jnp.where(data_mask,
                       d_pages * page_span + cell_ids(data[:, :2], data_mask,
                                                      origin=origins[d_pages]),
                       invalid)
        od = jnp.argsort(cd).astype(jnp.int32)
        cd_sorted = cd[od]
    else:
        od, cd_sorted = d_presorted
    q4 = jnp.concatenate(
        [query[:, :3], (q_pages.astype(query.dtype) * PAGE_ISO)[:, None]], 1)
    d4 = jnp.concatenate(
        [data[:, :3], (d_pages.astype(data.dtype) * PAGE_ISO)[:, None]], 1)
    q_t8 = prep_t8(q4[oq], query_mask[oq], 1)
    d_t8 = prep_t8(d4[od], data_mask[od], 1)
    tq = min(TQ, nq)
    # static band = capacity only (per-block true spans drive the cost);
    # sized for one page's cell-row structure as in dbscan_labels_paged
    per_page = nd // n_pages
    w_band = max(8192, -(-int(per_page * 0.35) // TD) * TD)
    w_band = min(w_band, -(-nd // TD) * TD)
    starts, ends, ovf = block_windows(cq[oq], cd_sorted, tq, w_band,
                                      invalid_cid=invalid)
    w_full = -(-nd // TD) * TD

    def nearest(starts_, w_, ends_):
        bd, bi = banded_nearest(q_t8, d_t8, starts_, tq, w_, ndim=4,
                                ends=ends_)
        bd, bi = bd[:nq], jnp.minimum(bi[:nq], nd - 1)
        d2 = jnp.full(nq, jnp.inf, jnp.float32).at[oq].set(bd)
        di = jnp.zeros(nq, jnp.int32).at[oq].set(od[bi])
        return d2, di

    w2 = min(2 * w_band, w_full)
    if w_full == w_band:
        d2, idx0 = nearest(starts, w_band, ends)
    elif w2 == w_full:
        # overflow fallback: the SAME kernel at full width — identical
        # arithmetic, and the iso column keeps cross-page candidates
        # beyond any threshold
        d2, idx0 = jax.lax.cond(
            ovf,
            lambda: nearest(jnp.zeros_like(starts), w_full, None),
            lambda: nearest(starts, w_band, ends))
    else:
        # middle tier at 2x band before the quadratic full pass: at many
        # pages the full fallback is O(nq * nd) over EVERY page, so one
        # locally-dense cell row must not trigger it
        starts2, ends2, ovf2 = block_windows(cq[oq], cd_sorted, tq, w2,
                                             invalid_cid=invalid)
        d2, idx0 = jax.lax.cond(
            ovf,
            lambda: jax.lax.cond(
                ovf2,
                lambda: nearest(jnp.zeros_like(starts), w_full, None),
                lambda: nearest(starts2, w2, ends2)),
            lambda: nearest(starts, w_band, ends))
    thr = (float(np.float32(np.float64(dist_threshold) + 1.25e-5))
           if isinstance(dist_threshold, (int, float)) else dist_threshold)
    point_labels = labels[idx0]
    point_labels = jnp.where(d2 > thr, -1, point_labels)
    point_labels = jnp.where(query_mask, point_labels, -1)
    # probabilities only travel with a transferred label: beyond the
    # cutoff the "nearest" is whatever the (banded) pass happened to see
    # — a band-composition-dependent garbage value no consumer may read
    # (the pipeline masks by probability only where labels >= 0)
    point_probs = (jnp.where(point_labels >= 0, probabilities[idx0], 0.0)
                   if probabilities is not None else None)
    return point_labels, point_probs


def chamfer_distance(points_1, mask_1, points_2, mask_2, threshold: float = 0.2):
    """Symmetric thresholded chamfer (pointcloud_utils.py:476-493)."""
    d12, _ = knn(points_1, mask_1, points_2, mask_2, k=1)
    d21, _ = knn(points_2, mask_2, points_1, mask_1, k=1)

    def masked_mean(d, m):
        sel = m & (d[:, 0] < threshold)
        return jnp.sum(jnp.where(sel, d[:, 0], 0.0)) / jnp.maximum(jnp.sum(sel), 1)

    return (masked_mean(d12, mask_1) + masked_mean(d21, mask_2)) / 2.0
