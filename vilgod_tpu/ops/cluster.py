"""TPU-native density clustering and cluster tables.

Replaces the reference's CPU `hdbscan.HDBSCAN(cluster_selection_epsilon=
0.15, min_cluster_size=15)` (`/root/reference/tools/configs/preprocessor/
waymo.yaml:10-15`, fit at `src/vilgod/zero_shot_detector.py:236`) with a
radius-graph connected-components kernel with DBSCAN-style core/border
semantics — the substitution sanctioned by BASELINE.json ("TPU-friendly
neighbor-graph connected-components kernel with fidelity-matched cluster
assignments"):

1. exact radius graph (blockwise distance passes, no materialized
   neighbor lists);
2. core points = at least ``min_samples`` neighbors within eps (exact
   radius count, not k-truncated);
3. connected components over the core-core subgraph via min-label
   propagation + pointer jumping (O(log n) rounds);
4. border points adopt the label of their nearest core neighbor within
   eps; clusters smaller than ``min_cluster_size`` become noise (-1);
5. probabilities: 1.0 for core points, ``1 - d/eps`` for border points
   (the pipeline masks probability < 0.3 as noise, mirroring
   `lidar_frame.py:163-165`).

Everything is static-shape and jittable; labels are compacted to
``[0, max_clusters)`` with -1 noise.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .neighbors import _use_pallas, knn, radius_count_self


def _propagate(labels, radius_min, core, n, propagation_rounds):
    """Connected components over the core-core radius graph: per round,
    one (banded or full) min-label distance pass, a Shiloach-Vishkin hook
    (scatter-min of each tree's neighborhood minimum onto its root), and
    path compression — components merge pairwise-or-better per round, so
    rounds = O(log diameter) distance passes."""
    big = jnp.asarray(n, jnp.int32)

    def jump(labels):
        hop = jnp.where(labels < big, labels, 0)
        return jnp.where(labels < big, jnp.minimum(labels, labels[hop]), big)

    def compress(labels):
        # ONE pointer jump per round: with the hook merging whole
        # components, trees stay depth ~1-2 and the outer convergence
        # check covers stragglers. Gathers cost ~6 ns/element on the
        # v5e, so each dropped jump saves 2 (N,)-gathers per round —
        # measured net win over 4 jumps at every tested scale.
        return jump(labels)

    def hook(labels, nbr_min):
        root = jnp.where(labels < big, labels, n)
        root_best = jnp.full(n + 1, big, jnp.int32).at[root].min(nbr_min)
        return jnp.minimum(nbr_min, root_best[jnp.minimum(root, n - 1)])

    def cond(state):
        labels, prev, it = state
        return (it < propagation_rounds) & jnp.any(labels != prev)

    def body(state):
        labels, _, it = state
        nbr_min = radius_min(labels)
        new = compress(jnp.where(core, hook(labels, nbr_min), big))
        # NO inner star contractions: measured at bench occupancy
        # (24 pages x 40960, real stage-3 features), re-aggregating the
        # same distance-pass minima onto updated roots does not reduce
        # the outer round count (5 rounds with 0, 1, 2, or 3 inner
        # iterations, labels bit-identical) while each inner hook+jump
        # costs ~100 ms/sequence in scatter-min + gathers over the
        # flattened page buffer. One hook per distance pass is the
        # Shiloach-Vishkin minimum and the measured optimum.
        return new, labels, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (compress(radius_min(labels)), labels, jnp.asarray(0)))
    return labels


def _dbscan_tail(labels, mask, core, radius, radius2, nearest_d2,
                 nearest_core, min_cluster_size):
    """Border attachment + cluster-size filter + probabilities."""
    n = labels.shape[0]
    big = jnp.asarray(n, jnp.int32)
    nearest_core = jnp.minimum(nearest_core, n - 1)
    # a border point attaches when it sits inside its nearest core's radius
    has_core_nbr = nearest_d2 <= radius2[nearest_core]
    border = mask & ~core & has_core_nbr
    labels = jnp.where(border, labels[nearest_core], labels)
    labels = jnp.where(mask & ~core & ~has_core_nbr, big, labels)

    sizes = jax.ops.segment_sum(
        jnp.where(labels < big, 1, 0), jnp.minimum(labels, big - 1),
        num_segments=n)
    keep = labels < big
    keep &= sizes[jnp.minimum(labels, big - 1)] >= min_cluster_size
    labels = jnp.where(keep, labels, -1)

    probs = jnp.where(core, 1.0, jnp.maximum(
        0.0, 1.0 - jnp.sqrt(nearest_d2) / radius[nearest_core]))
    probs = jnp.where(labels >= 0, probs, 0.0)
    return labels, probs


def _core_radii(counts3, mask, levels, eps_cap, min_samples, dtype):
    """Quantized core distances from the 3-level neighbor counts."""
    counts3 = jnp.where(mask[:, None], jnp.maximum(counts3 - 1, 0), 0)
    enough = counts3 >= (min_samples - 1)  # counts exclude self
    first = jnp.argmax(enough, axis=1)
    radius = jnp.where(jnp.any(enough, axis=1), levels[first], eps_cap)
    return radius.astype(dtype), mask & enough[:, -1]


def _dbscan_full(points, mask, eps, min_samples, min_cluster_size,
                 block_size, propagation_rounds, adaptive, eps_cap_factor):
    """Brute-force path: every pass scans the full cloud (small inputs,
    and the on-device fallback when a banded window overflows)."""
    n = points.shape[0]
    ndim = points.shape[1]
    use_pallas = _use_pallas()

    n_blocks = -(-n // block_size)
    pad = n_blocks * block_size - n
    pts_b = jnp.pad(points, ((0, pad), (0, 0))).reshape(n_blocks, block_size, -1)

    if use_pallas:
        from .pallas_kernels import TD, TQ, prep_t8
        pts_tq = prep_t8(points, mask, TQ)
        pts_td = prep_t8(points, mask, TD)

    if adaptive:
        # core distance quantized to 3 radius levels via ONE blockwise
        # multi-threshold counting pass (an exact kNN would need top_k,
        # which is sort-bound on the VPU): the point's radius is the
        # smallest level holding >= min_samples neighbors.
        eps_cap = eps * eps_cap_factor
        levels = jnp.asarray([eps, eps * (eps_cap_factor ** 0.5), eps_cap],
                             points.dtype)
        if use_pallas:
            from .pallas_kernels import tile_radius_count3
            counts3 = tile_radius_count3(pts_tq, pts_td, levels * levels,
                                         ndim=ndim)[:n]
        else:
            counts3 = _radius_count_multi(points, mask, levels, block_size) + (
                jnp.where(mask, 1, 0)[:, None])  # re-add self, removed below
        radius, core = _core_radii(counts3, mask, levels, eps_cap,
                                   min_samples, points.dtype)
    else:
        counts = _radius_count_full(points, mask, eps, block_size=block_size)
        # counts exclude self; DBSCAN's min_samples includes the point
        core = mask & (counts >= (min_samples - 1))
        radius = jnp.full(n, eps, points.dtype)
    radius2 = radius * radius

    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.asarray(n, jnp.int32)
    labels = jnp.where(core, idx, big)

    rad2_b = jnp.pad(radius2, (0, pad)).reshape(n_blocks, block_size)

    if use_pallas:
        from .pallas_kernels import tile_min_label
        core_pts_td = prep_t8(points, core, TD)
        core_pts_tq = prep_t8(points, core, TQ)
        r2_td = jnp.pad(jnp.where(core, radius2, 0.0),
                        (0, core_pts_td.shape[1] - n))

        def radius_min(labels):
            lab_td = jnp.pad(jnp.where(core, labels, 2**30),
                             (0, core_pts_td.shape[1] - n),
                             constant_values=2**30)
            best = tile_min_label(core_pts_td, r2_td, lab_td, ndim=ndim)[:n]
            best = jnp.minimum(best, big)
            return jnp.where(core, jnp.minimum(labels, best), big)
    else:
        def radius_min(labels):
            """min label over core points within the joint radius."""
            lab_b = jnp.pad(labels, (0, pad), constant_values=n).reshape(
                n_blocks, block_size)
            core_b = jnp.pad(core, (0, pad)).reshape(n_blocks, block_size)

            def body(carry, blk):
                d, cm, lb, r2b = blk
                dist2 = _sq_dists_full(points, d)
                # max-radius joint = HDBSCAN mutual-reachability linkage
                joint = jnp.maximum(radius2[:, None], r2b[None, :])
                cand = jnp.where((dist2 <= joint) & cm[None, :], lb[None, :], big)
                return jnp.minimum(carry, jnp.min(cand, axis=1)), None

            best, _ = jax.lax.scan(body, jnp.full(n, n, jnp.int32),
                                   (pts_b, core_b, lab_b, rad2_b))
            return jnp.where(core, jnp.minimum(labels, best), big)

    labels = _propagate(labels, radius_min, core, n, propagation_rounds)

    # --- border points: nearest core point within eps (blockwise) ---
    if use_pallas:
        from .pallas_kernels import tile_nearest
        bd, bi = tile_nearest(pts_tq, core_pts_td, ndim=ndim)
        nearest_d2, nearest_core = bd[:n], bi[:n]
    else:
        core_b = jnp.pad(core, (0, pad)).reshape(n_blocks, block_size)

        def body(carry, blk):
            best_d, best_i = carry
            (d, cm), bidx = blk
            dist2 = _sq_dists_full(points, d)
            dist2 = jnp.where(cm[None, :], dist2, jnp.inf)
            bd = jnp.min(dist2, axis=1)
            bi = jnp.argmin(dist2, axis=1).astype(jnp.int32) + bidx * block_size
            take = bd < best_d
            return (jnp.where(take, bd, best_d), jnp.where(take, bi, best_i)), None

        init = (jnp.full(n, jnp.inf, points.dtype), jnp.zeros(n, jnp.int32))
        (nearest_d2, nearest_core), _ = jax.lax.scan(
            body, init, ((pts_b, core_b), jnp.arange(n_blocks)))

    return _dbscan_tail(labels, mask, core, radius, radius2,
                        nearest_d2, nearest_core, min_cluster_size)


def _dbscan_banded(points, mask, cid_sorted, eps, min_samples,
                   min_cluster_size, propagation_rounds, eps_cap_factor,
                   w_band=None, invalid_cid=None):
    """Banded path over a CELL-SORTED cloud: every distance pass scans a
    per-block rank window instead of the whole cloud (ops/banded.py).

    Overflow handling is PER PASS (r5): when a pass's windows exceed the
    static band, that pass alone re-runs the SAME kernel at full width
    (starts=0, no span skip) — identical arithmetic, exhaustive window.
    The old design instead lax.cond'ed between this whole function and
    `_dbscan_full` at the call site, which at paged scale (1.3M
    flattened points) traced a second complete clustering program into
    every chunk compile — measured 19 MINUTES of XLA compile for the
    production chunk program, long enough to crash the hosted-TPU
    worker. Pass-level conds keep one algorithm with two window widths
    per kernel."""
    from .banded import (band_width, banded_min_label, banded_nearest,
                         banded_radius_count3, block_windows)
    from .pallas_kernels import TD, TQ, TQ_HEAVY, prep_t8

    n, ndim = points.shape
    if w_band is None:
        w_band = band_width(n, tile=TD)
    if invalid_cid is None:
        from .banded import _INVALID_CID as invalid_cid
    w_full = -(-n // TD) * TD
    w_band = min(w_band, w_full)
    tq_l, tq_h = min(TQ, n), min(TQ_HEAVY, n)
    starts_l, ends_l, ovf_l = block_windows(cid_sorted, cid_sorted, tq_l,
                                            w_band, invalid_cid=invalid_cid)
    starts_h, ends_h, ovf_h = block_windows(cid_sorted, cid_sorted, tq_h,
                                            w_band, invalid_cid=invalid_cid)

    def pass_cond(ovf, banded_call, starts, ends, w):
        """Run a distance pass banded, or at full width on overflow.
        ``banded_call(starts, w, ends)`` must be shape-stable in w."""
        if w == w_full:
            return banded_call(jnp.zeros_like(starts), w_full, None)
        return jax.lax.cond(
            ovf,
            lambda: banded_call(jnp.zeros_like(starts), w_full, None),
            lambda: banded_call(starts, w, ends))

    eps_cap = eps * eps_cap_factor
    levels = jnp.asarray([eps, eps * (eps_cap_factor ** 0.5), eps_cap],
                         points.dtype)
    pts_t8 = prep_t8(points, mask, 1)
    counts3 = pass_cond(
        ovf_h,
        lambda s, w, e: banded_radius_count3(pts_t8, pts_t8, s,
                                             levels * levels, tq_h, w,
                                             ndim=ndim, ends=e),
        starts_h, ends_h, w_band)[:n]
    radius, core = _core_radii(counts3, mask, levels, eps_cap, min_samples,
                               points.dtype)
    radius2 = radius * radius

    big = jnp.asarray(n, jnp.int32)

    # --- core compaction (r5): only CORE points participate in the
    # propagation passes (both sides) and as the nearest pass's data
    # side, so compact them to the front of the rank space. The
    # compaction is order-preserving, keeping the cell sort (and page
    # isolation) intact for the banded window machinery. Compacted query
    # blocks span more cells than all-point blocks, so the propagation
    # windows get their own overflow flag.
    core_pos = jnp.cumsum(core.astype(jnp.int32)) - 1
    core_src = jnp.full(n + 1, n, jnp.int32).at[
        jnp.where(core, core_pos, n)].set(jnp.arange(n, dtype=jnp.int32))[:n]
    valid_c = core_src < n
    src_cl = jnp.minimum(core_src, n - 1)
    pts_c = points[src_cl]
    cid_c = jnp.where(valid_c, cid_sorted[src_cl], invalid_cid)
    r2_c = jnp.where(valid_c, radius2[src_cl], 0.0).astype(jnp.float32)
    core_t8 = prep_t8(pts_c, valid_c, 1)
    starts_p, ends_p, ovf_p = block_windows(cid_c, cid_c, tq_h, w_band,
                                            invalid_cid=invalid_cid)
    starts_n, ends_n, ovf_n = block_windows(cid_sorted, cid_c, tq_l, w_band,
                                            invalid_cid=invalid_cid)

    # propagation runs ENTIRELY in compacted space with COMPACTED label
    # values: compaction is order-preserving, so min over compacted
    # ranks == min over original ranks and the final labels (translated
    # back below) are identical — while each round drops the two
    # full-space translate gathers the mixed formulation paid (measured
    # ~15 ms/round of random-access HBM traffic at 1.3M points).
    labels_c0 = jnp.where(valid_c, jnp.arange(n, dtype=jnp.int32), big)

    def radius_min(labels_c):
        lab_f = jnp.where(valid_c, labels_c, 2**30).astype(jnp.float32)
        best = pass_cond(
            ovf_p,
            lambda s, w, e: banded_min_label(core_t8, r2_c, lab_f, s, tq_h,
                                             w, ndim, 2**30, ends=e),
            starts_p, ends_p, w_band)[:n]
        best = jnp.minimum(best.astype(jnp.int32), big)
        return jnp.where(valid_c, jnp.minimum(labels_c, best), big)

    labels_c = _propagate(labels_c0, radius_min, valid_c, n,
                          propagation_rounds)
    # translate compacted label values -> original sorted ranks, expand
    # to full rank space (non-core points get `big` until border attach)
    lab_val = core_src[jnp.minimum(labels_c, n - 1)]
    labels = jnp.full(n + 1, n, jnp.int32).at[
        jnp.where(valid_c, src_cl, n)].set(
        jnp.where(valid_c, lab_val, big))[:n]

    # nearest-within-band is exact for border attachment: anything outside
    # the band is farther than eps_cap < CELL by the band guarantee
    nearest_d2, nc = pass_cond(
        ovf_l | ovf_n,
        lambda s, w, e: banded_nearest(pts_t8, core_t8, s, tq_l, w,
                                       ndim=ndim, ends=e),
        starts_n, ends_n, w_band)
    nearest_d2 = nearest_d2[:n]
    nearest_core = core_src[jnp.minimum(nc[:n], n - 1)]

    return _dbscan_tail(labels, mask, core, radius, radius2,
                        nearest_d2, nearest_core, min_cluster_size)


@partial(jax.jit, static_argnames=("block_size", "propagation_rounds",
                                   "adaptive", "min_samples"))
def dbscan_labels(
    points: jax.Array,
    mask: jax.Array,
    eps: float = 0.15,
    min_samples: int = 15,
    min_cluster_size: int = 15,
    block_size: int = 4096,
    propagation_rounds: int = 64,
    adaptive: bool = True,
    eps_cap_factor: float = 2.0,
) -> tuple[jax.Array, jax.Array]:
    """Cluster ``points`` (N, F) -> (labels (N,), probabilities (N,)).

    Distances use all F feature columns (the pipeline clusters 5-D
    [xyz, entropy, 0.1*frame] features, zero_shot_detector.py:229-236).

    Connectivity is exact: each propagation round takes the min label over
    *all* core points within the connection radius (no kNN truncation — a
    k-limited neighbor graph drops the sparse cross-slice edges that keep
    a moving object's two frame-slices connected). Large inputs run the
    cell-sorted BANDED passes (ops/banded.py) with an on-device exact
    full-pass fallback when a band window overflows; convergence uses
    hook + path compression (O(log diameter) distance passes).

    ``adaptive=True`` approximates HDBSCAN's mutual-reachability linkage
    (the behavior of ``hdbscan(cluster_selection_epsilon=eps)`` the
    reference relies on): each point's connection radius is its
    ``min_samples``-th neighbor distance (its core distance) clipped to
    [eps, eps_cap_factor * eps], and two core points link when their
    distance fits the LARGER endpoint radius — single linkage under the
    mutual-reachability metric max(core_a, core_b, d), which is what
    merges HDBSCAN clusters across density gradients (entropy-boundary
    bridges on real pipeline features; pinned by the fidelity harness in
    test_cluster.py). Sparse background exceeds the cap, stays non-core,
    and remains noise. ``adaptive=False`` is plain DBSCAN.
    """
    n = points.shape[0]
    full_args = (eps, min_samples, min_cluster_size, block_size,
                 propagation_rounds, adaptive, eps_cap_factor)
    if not adaptive or n < 4096 or n % 2048 != 0:
        return _dbscan_full(points, mask, *full_args)

    from .banded import sort_by_cell

    order, cid_sorted = sort_by_cell(points, mask)
    pts, msk = points[order], mask[order]
    # overflow now handled per pass inside (full-width re-run of the
    # same kernels) — no second whole-algorithm trace
    labels_s, probs_s = _dbscan_banded(pts, msk, cid_sorted, eps,
                                       min_samples, min_cluster_size,
                                       propagation_rounds, eps_cap_factor)
    labels = jnp.full(n, -1, jnp.int32).at[order].set(labels_s)
    probs = jnp.zeros(n, points.dtype).at[order].set(probs_s)
    return labels, probs




# isolation spacing for the page column of the paged clustering: pages
# sit PAGE_ISO apart in feature space, far beyond any eps_cap, so no
# code path (banded, full fallback, border attachment) can connect them
PAGE_ISO = 1.0e4


def paged_cell_sort(points: jax.Array, mask: jax.Array, pages: jax.Array,
                    n_pages: int, origins: jax.Array | None = None):
    """The paged cell-id sort shared by :func:`dbscan_labels_paged` and
    :func:`knn_labels_paged`'s data side: (order, cid_sorted). Computing
    it once in the caller saves a ~983k-element argsort per chunk.

    ``origins`` (n_pages, 2): per-page cell-grid origin (default: each
    page's own corner). A caller reusing this sort for a SECOND cloud's
    window search (the label transfer) must compute ids for that cloud
    with the same origins."""
    from .banded import GRID, cell_ids, page_origins

    page_span = GRID * GRID
    assert n_pages * page_span < 2 ** 31, (
        f"paged_cell_sort: {n_pages} pages x GRID^2 overflows int32 ids")
    if origins is None:
        origins = page_origins(points[:, :2], mask, pages, n_pages)
    cell = cell_ids(points[:, :2], mask, origin=origins[pages])
    cid = jnp.where(mask, pages * page_span + cell, n_pages * page_span)
    order = jnp.argsort(cid).astype(jnp.int32)
    return order, cid[order]


@partial(jax.jit, static_argnames=("n_pages", "eps", "min_samples",
                                   "min_cluster_size", "propagation_rounds",
                                   "eps_cap_factor"))
def dbscan_labels_paged(
    points: jax.Array,
    mask: jax.Array,
    pages: jax.Array,
    n_pages: int,
    eps: float = 0.15,
    min_samples: int = 15,
    min_cluster_size: int = 15,
    propagation_rounds: int = 64,
    eps_cap_factor: float = 2.0,
    presorted: tuple | None = None,
    origins: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Cluster MANY independent point sets ("pages" — one per frame
    window) in ONE device program: clusters never cross pages, and all
    pages share a single propagation while_loop, so the per-pass grid
    and dispatch overheads amortize across the whole chunk instead of
    paying per frame.

    Isolation is enforced twice over: the banded passes sort by a paged
    cell id (page * GRID^2 + cell — windows cannot span the page gap),
    and the features carry an extra ``page * PAGE_ISO`` column so even
    the full-pass overflow fallback keeps pages unreachable from each
    other by distance. Returns labels in sorted-rank value space
    (compact per page with :func:`compact_labels_any`).
    """
    from .banded import GRID
    from .pallas_kernels import TD, TQ, TQ_HEAVY

    n = points.shape[0]
    # fail at the entry point with a readable message instead of deep
    # inside block_windows' reshape (callers must pass TD/TQ-multiple
    # flattened sizes — in practice pages x a 2048-multiple cap_in)
    assert n % max(TD, TQ, TQ_HEAVY) == 0, (
        f"dbscan_labels_paged: flattened size {n} must be a multiple of "
        f"{max(TD, TQ, TQ_HEAVY)} (pages x 2048-multiple page capacity)")
    iso = (pages.astype(points.dtype) * PAGE_ISO)[:, None]
    pts_iso = jnp.concatenate([points, iso], axis=1)

    page_span = GRID * GRID
    if presorted is None:
        presorted = paged_cell_sort(points, mask, pages, n_pages,
                                    origins=origins)
    order, cid_sorted = presorted
    pts_s, msk_s = pts_iso[order], mask[order]

    # band sized for a page's cell-row structure, NOT the page length:
    # a window needs the block's cell rows +-1, which is a handful of
    # rows' worth of points (measured ~0.25-0.3x the page size on
    # 90 m scenes; sparse edge blocks dominate). Overflow still falls
    # back exactly, it just loses the speedup.
    invalid = n_pages * page_span
    per_page = n // n_pages
    w_band = max(8192, -(-int(per_page * 0.35) // TD) * TD)
    w_band = min(w_band, -(-n // TD) * TD)
    # overflow handled per pass inside _dbscan_banded: a full-width
    # re-run of the same kernels replaces the old whole-program
    # `_dbscan_full` fallback trace, which at this flattened size was
    # the bulk of a 19-minute chunk compile (r5)
    labels_s, probs_s = _dbscan_banded(pts_s, msk_s, cid_sorted, eps,
                                       min_samples, min_cluster_size,
                                       propagation_rounds, eps_cap_factor,
                                       w_band=w_band, invalid_cid=invalid)
    labels = jnp.full(n, -1, jnp.int32).at[order].set(labels_s)
    probs = jnp.zeros(n, points.dtype).at[order].set(probs_s)
    return labels, probs


def compact_labels_any(labels: jax.Array, max_clusters: int) -> jax.Array:
    """Like :func:`compact_labels` but for arbitrary non-negative label
    VALUES (the paged clustering returns global sorted-rank roots that
    exceed the per-page length). Ranks distinct values ascending."""
    big = jnp.asarray(2**30, labels.dtype)
    sorted_lab = jnp.sort(jnp.where(labels >= 0, labels, big))
    is_first = jnp.concatenate([
        sorted_lab[:1] < big,
        (sorted_lab[1:] != sorted_lab[:-1]) & (sorted_lab[1:] < big)])
    ranks = jnp.cumsum(is_first) - 1
    pos = jnp.searchsorted(sorted_lab, jnp.maximum(labels, 0)).astype(jnp.int32)
    compact = jnp.where(labels >= 0,
                        ranks[jnp.minimum(pos, labels.shape[0] - 1)], -1)
    return jnp.where(compact >= max_clusters, -1, compact).astype(jnp.int32)


def compact_labels(labels: jax.Array, max_clusters: int) -> jax.Array:
    """Map arbitrary non-negative labels to [0, max_clusters); -1 stays -1.

    Cluster order follows ascending root label, matching np.sort(unique)
    ordering of the reference (`lidar_frame.py:167`).
    """
    n = labels.shape[0]
    present = jnp.zeros(n + 1, jnp.int32).at[jnp.where(labels >= 0, labels, n)].set(1)
    present = present[:n]
    new_ids = jnp.cumsum(present) - 1  # rank of each root label
    compact = jnp.where(labels >= 0, new_ids[jnp.maximum(labels, 0)], -1)
    compact = jnp.where(compact >= max_clusters, -1, compact)
    return compact


@partial(jax.jit, static_argnames=("num_clusters", "capacity"))
def build_cluster_table(
    labels: jax.Array, mask: jax.Array, num_clusters: int, capacity: int
) -> tuple[jax.Array, jax.Array]:
    """Gather per-cluster point indices into a padded table.

    labels: (N,) compact in [0, num_clusters) or -1.
    Returns (table (C, P) int32 indices into the cloud, table_mask (C, P)).
    Overflowing points beyond ``capacity`` per cluster are dropped (first
    ``capacity`` points in index order are kept).
    """
    n = labels.shape[0]
    valid = mask & (labels >= 0) & (labels < num_clusters)
    sort_key = jnp.where(valid, labels, num_clusters)
    # stable argsort keeps ascending point order within each cluster
    order = jnp.argsort(sort_key, stable=True).astype(jnp.int32)
    sorted_labels = sort_key[order]
    starts = jnp.searchsorted(sorted_labels, jnp.arange(num_clusters)).astype(jnp.int32)
    pos = jnp.arange(n, dtype=jnp.int32) - starts[jnp.minimum(sorted_labels, num_clusters - 1)]
    in_table = (sorted_labels < num_clusters) & (pos < capacity)
    flat = jnp.where(
        in_table, sorted_labels * capacity + pos, num_clusters * capacity
    )
    table = (
        jnp.full(num_clusters * capacity + 1, -1, jnp.int32)
        .at[flat]
        .set(jnp.where(in_table, order, -1))[: num_clusters * capacity]
        .reshape(num_clusters, capacity)
    )
    return table, table >= 0


def cluster_sizes(labels: jax.Array, mask: jax.Array, num_clusters: int) -> jax.Array:
    valid = mask & (labels >= 0)
    return jax.ops.segment_sum(
        jnp.where(valid, 1, 0),
        jnp.where(valid, labels, num_clusters),
        num_segments=num_clusters + 1,
    )[:num_clusters]


# ---------------------------------------------------------------------------
# feature-general brute-force helpers (points may have >3 columns)
# ---------------------------------------------------------------------------

def _sq_dists_full(q: jax.Array, d: jax.Array) -> jax.Array:
    """Squared distances; MXU matmul form for plain features, exact
    difference form once a page-offset column is present.

    The matmul form (q^2 + d^2 - 2qd) catastrophically cancels once any
    feature column is large: the paged clustering carries a page-offset
    column at ~1e4, where f32 ULP of the cross term (~256 at 2.5e9)
    dwarfs every eps^2 threshold and silently connects everything. The
    difference form is exact at any magnitude (and matches the pallas
    kernels bitwise) but runs on the VPU; plain <=5-D LiDAR features
    keep the bf16x3 matmul (HIGH precision, error ~1e-3 << eps^2)."""
    if q.shape[1] > 5:  # page-offset column appended -> exactness first
        acc = None
        for c in range(q.shape[1]):
            diff = q[:, c][:, None] - d[:, c][None, :]
            acc = diff * diff if acc is None else acc + diff * diff
        return acc
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    d2 = jnp.sum(d * d, axis=-1, keepdims=True).T
    cross = jax.lax.dot_general(q, d.T, (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGH)
    return jnp.maximum(q2 + d2 - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("k", "block_size"))
def _knn_full(points: jax.Array, mask: jax.Array, k: int, block_size: int):
    n = points.shape[0]
    n_blocks = -(-n // block_size)
    pad = n_blocks * block_size - n
    data = jnp.pad(points, ((0, pad), (0, 0))).reshape(n_blocks, block_size, -1)
    dmask = jnp.pad(mask, (0, pad)).reshape(n_blocks, block_size)

    init = (jnp.full((n, k), jnp.inf, points.dtype), jnp.zeros((n, k), jnp.int32))

    def body(carry, blk):
        best_d, best_i = carry
        (d, m), bidx = blk
        dist2 = _sq_dists_full(points, d)
        dist2 = jnp.where(m[None, :], dist2, jnp.inf)
        bd, bl = jax.lax.top_k(-dist2, k)
        bd = -bd
        bi = bl + bidx * block_size
        cat_d = jnp.concatenate([best_d, bd], axis=1)
        cat_i = jnp.concatenate([best_i, bi], axis=1)
        md, sel = jax.lax.top_k(-cat_d, k)
        return (-md, jnp.take_along_axis(cat_i, sel, axis=1)), None

    (dists, idx), _ = jax.lax.scan(body, init, ((data, dmask), jnp.arange(n_blocks)))
    dists = jnp.where(mask[:, None], dists, jnp.inf)
    return dists, idx


@partial(jax.jit, static_argnames=("block_size",))
def _radius_count_multi(points: jax.Array, mask: jax.Array, levels: jax.Array,
                        block_size: int):
    """Self neighbor counts at several radii in one blockwise pass,
    excluding self. points (N, F), levels (L,) -> (N, L) int32."""
    n = points.shape[0]
    lvl2 = (levels * levels)[None, None, :]  # (1, 1, L)
    n_blocks = -(-n // block_size)
    pad = n_blocks * block_size - n
    data = jnp.pad(points, ((0, pad), (0, 0))).reshape(n_blocks, block_size, -1)
    dmask = jnp.pad(mask, (0, pad)).reshape(n_blocks, block_size)

    def body(carry, blk):
        d, m = blk
        dist2 = _sq_dists_full(points, d)
        hits = jnp.sum((dist2[..., None] <= lvl2) & m[None, :, None], axis=1,
                       dtype=jnp.int32)
        return carry + hits, None

    init = jnp.zeros((n, levels.shape[0]), jnp.int32)
    counts, _ = jax.lax.scan(body, init, (data, dmask))
    return jnp.where(mask[:, None], jnp.maximum(counts - 1, 0), 0)


@partial(jax.jit, static_argnames=("block_size",))
def _radius_count_full(points: jax.Array, mask: jax.Array, radius, block_size: int):
    """Self radius count over full feature dim, excluding self."""
    n = points.shape[0]
    r2 = jnp.asarray(radius, points.dtype) ** 2
    n_blocks = -(-n // block_size)
    pad = n_blocks * block_size - n
    data = jnp.pad(points, ((0, pad), (0, 0))).reshape(n_blocks, block_size, -1)
    dmask = jnp.pad(mask, (0, pad)).reshape(n_blocks, block_size)

    def body(carry, blk):
        d, m = blk
        dist2 = _sq_dists_full(points, d)
        hits = jnp.sum((dist2 <= r2) & m[None, :], axis=1, dtype=jnp.int32)
        return carry + hits, None

    counts, _ = jax.lax.scan(body, jnp.zeros(n, jnp.int32), (data, dmask))
    return jnp.where(mask, jnp.maximum(counts - 1, 0), 0)  # exclude self
