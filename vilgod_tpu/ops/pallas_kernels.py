"""Pallas TPU kernels for the pairwise-distance hot loops.

Every O(N*D) pass in the pipeline — ball-query counting (the entropy hot
loop, `/root/reference/src/utils/pointcloud_utils.py:74-104` via CUDA
ball_query), DBSCAN connectivity, nearest-core/kNN-1 — shares one shape:
stream data tiles against query tiles, compute exact f32 squared
distances, reduce (count / min-label / arg-nearest). The XLA fallback
materializes each (N, block) distance matrix in HBM (~2 GB per block);
these kernels keep the tile in VMEM and write only the (N,)-sized result,
with the cross term on the MXU at full f32 precision (single-pass bf16
corrupts dist^2 beyond the pipeline's eps^2 thresholds).

All kernels take points TRANSPOSED and padded to 8 rows — (8, N) with
x,y,z[,f4,f5] in the leading rows and zeros elsewhere — so the lane
dimension is the point axis (128-aligned). Invalid points are pre-masked
to a far sentinel coordinate, which keeps them outside every radius and
removes in-kernel mask plumbing.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# query tiles are per-kernel: the single-threshold count and nearest
# kernels hold one (TQ, TD) f32 tile in VMEM and afford TQ=1024; the
# 3-threshold count and min-label kernels carry extra per-tile buffers
# and exceed the 16 MB scoped-VMEM budget above TQ=512.
TQ = 1024    # light kernels (count, nearest)
TQ_HEAVY = 512
TD = 2048    # data tile (lane-friendly multiples of 128)
SENTINEL = 1.0e6
_BIG_I = np.int32(2**30)


def pallas_supported() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def prep_t8(points: jax.Array, mask: jax.Array, tile: int) -> jax.Array:
    """(N, F<=8) + mask -> (8, N_pad) transposed, sentinel-masked."""
    n, f = points.shape
    pts = jnp.where(mask[:, None], points, SENTINEL)
    pad_n = -n % tile
    pts = jnp.pad(pts, ((0, pad_n), (0, 8 - f)), constant_values=SENTINEL)
    # feature padding must be zero, not sentinel (it enters the distance)
    if f < 8:
        pts = pts.at[:, f:].set(0.0)
    return pts.T


def _dist2_tile(q, d, ndim: int = 3):
    """q (8, TQ), d (8, TD) -> exact f32 squared distances (TQ, TD).

    Difference form on the VPU: with K=3..5 coordinates the MXU runs at
    ~3/128 utilization and f32 emulation multiplies that by 3-6x, so the
    elementwise (q-d)^2 accumulation is both exact and faster. Tiles live
    in VMEM; nothing spills to HBM.
    """
    acc = None
    for c in range(ndim):
        diff = q[c][:, None] - d[c][None, :]
        acc = diff * diff if acc is None else acc + diff * diff
    return acc


# ---------------------------------------------------------------------------
# radius count (single and multi-threshold)
# ---------------------------------------------------------------------------

def _make_count_kernel(ndim):
    def _count_kernel(r2_ref, q_ref, d_ref, out_ref):
        from jax.experimental import pallas as pl

        j = pl.program_id(1)
        dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)
        hits = jnp.sum((dist2 <= r2_ref[0, 0]).astype(jnp.float32), axis=1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += hits[None, :]
    return _count_kernel


@partial(jax.jit, static_argnames=("ndim",))
def tile_radius_count(query_t8: jax.Array, data_t8: jax.Array,
                      r2, ndim: int = 3) -> jax.Array:
    """Counts of data points within sqrt(r2) of each query. Inputs from
    :func:`prep_t8`; self-exclusion is the caller's job."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = query_t8.shape[1], data_t8.shape[1]
    r2_arr = jnp.asarray(r2, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        _make_count_kernel(ndim),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid=(n // TQ, d // TD),
        in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TQ), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
    )(r2_arr, query_t8, data_t8)
    return out[0].astype(jnp.int32)


def _make_count3_kernel(ndim):
    def _count3_kernel(lvl_ref, q_ref, d_ref, out_ref):
        from jax.experimental import pallas as pl

        j = pl.program_id(1)
        dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for lv in range(3):
            hits = jnp.sum((dist2 <= lvl_ref[0, lv]).astype(jnp.float32), axis=1)
            out_ref[lv, :] += hits
    return _count3_kernel


@partial(jax.jit, static_argnames=("ndim",))
def tile_radius_count3(query_t8: jax.Array, data_t8: jax.Array,
                       levels2: jax.Array, ndim: int = 3) -> jax.Array:
    """Counts at three squared-radius levels -> (N, 3)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = query_t8.shape[1], data_t8.shape[1]
    lvl = jnp.asarray(levels2, jnp.float32).reshape(1, 3)
    out = pl.pallas_call(
        _make_count3_kernel(ndim),
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
        grid=(n // TQ_HEAVY, d // TD),
        in_specs=[pl.BlockSpec((1, 3), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((8, TQ_HEAVY), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, TQ_HEAVY), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
    )(lvl, query_t8, data_t8)
    return out.T.astype(jnp.int32)


# ---------------------------------------------------------------------------
# min-label propagation step (DBSCAN connectivity)
# ---------------------------------------------------------------------------

def _make_minlabel_kernel(ndim):
    def _minlabel_kernel(q_ref, d_ref, qr2_ref, dr2_ref, lab_ref, out_ref):
        from jax.experimental import pallas as pl

        j = pl.program_id(1)
        dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)
        # HDBSCAN mutual-reachability linkage: an edge exists when the
        # distance fits the LARGER endpoint radius (max(core_a, core_b, d)
        # single-linkage); non-core lanes sit at sentinel coords
        joint = jnp.maximum(qr2_ref[0][:, None], dr2_ref[0][None, :])
        cand = jnp.where(dist2 <= joint, lab_ref[0][None, :].astype(jnp.float32),
                         float(_BIG_I))
        best = jnp.min(cand, axis=1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.full_like(out_ref, float(_BIG_I))

        out_ref[:] = jnp.minimum(out_ref[:], best[None, :])
    return _minlabel_kernel


@partial(jax.jit, static_argnames=("ndim",))
def tile_min_label(points_t8: jax.Array, radius2: jax.Array,
                   labels: jax.Array, ndim: int = 3) -> jax.Array:
    """One exact radius-graph min-label pass: for each point, the minimum
    label among points within the joint (min) radius. Non-core points
    must carry sentinel coordinates and label >= 2**30.

    labels as float32 is exact for values < 2**24 (point indices).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = points_t8.shape[1]
    r2row = radius2.reshape(1, n).astype(jnp.float32)
    labrow = labels.reshape(1, n).astype(jnp.float32)
    out = pl.pallas_call(
        _make_minlabel_kernel(ndim),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid=(n // TQ_HEAVY, n // TD),
        in_specs=[pl.BlockSpec((8, TQ_HEAVY), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TQ_HEAVY), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TQ_HEAVY), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
    )(points_t8, points_t8, r2row, r2row, labrow)
    return out[0].astype(jnp.int32)


def _make_minlabel_qd_kernel(ndim):
    def _kernel(q_ref, d_ref, qr2_ref, dr2_ref, lab_ref, out_ref):
        from jax.experimental import pallas as pl

        j = pl.program_id(1)
        dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)
        # max-radius joint: see _make_minlabel_kernel
        joint = jnp.maximum(qr2_ref[0][:, None], dr2_ref[0][None, :])
        cand = jnp.where(dist2 <= joint, lab_ref[0][None, :], float(_BIG_I))
        best = jnp.min(cand, axis=1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.full_like(out_ref, float(_BIG_I))

        out_ref[:] = jnp.minimum(out_ref[:], best[None, :])
    return _kernel


@partial(jax.jit, static_argnames=("ndim",))
def tile_min_label_qd(query_t8: jax.Array, data_t8: jax.Array,
                      q_r2: jax.Array, d_r2: jax.Array, labels: jax.Array,
                      ndim: int = 3) -> jax.Array:
    """Min-label pass of a query block against a data window (the banded
    variant of :func:`tile_min_label`): query and data are DIFFERENT
    slices of the sorted core cloud. labels/radii are float32 rows
    aligned with the respective lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = query_t8.shape[1], data_t8.shape[1]
    qr2 = q_r2.reshape(1, n).astype(jnp.float32)
    dr2 = d_r2.reshape(1, d).astype(jnp.float32)
    lab = labels.reshape(1, d).astype(jnp.float32)
    tq = min(TQ_HEAVY, n)
    out = pl.pallas_call(
        _make_minlabel_qd_kernel(ndim),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid=(n // tq, d // TD),
        in_specs=[pl.BlockSpec((8, tq), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tq), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tq), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
    )(query_t8, data_t8, qr2, dr2, lab)
    return out[0]


# ---------------------------------------------------------------------------
# single-launch banded kernels (scalar-prefetched window starts + widths)
# ---------------------------------------------------------------------------
# The banded drivers in ops/banded.py originally ran an outer lax.scan over
# query blocks, launching one pallas kernel per block (~40 launches per
# pass at bench scale); per-launch dispatch overhead dominated the actual
# tile math. These variants run the WHOLE pass as ONE kernel: the grid is
# (query_block, window_tile) and the per-block window start — in TD-tile
# units, via PrefetchScalarGridSpec — selects which data tile each grid
# step DMAs. Window starts round DOWN to a tile boundary, so callers pass
# ``n_d_tiles = w_band // TD + 1`` to keep the guaranteed-coverage band.
#
# The scalar-prefetch operand ``sw`` is a packed (2, NB) int32: row 0 is
# each block's window start tile, row 1 its TRUE width in tiles (from the
# block's actual [lo, hi) candidate span — usually 2-3 tiles vs the 9-tile
# static band at bench scale). Grid steps past a block's true width clamp
# their data index_map to the last real tile (pallas skips the re-DMA of
# an unchanged block) and skip their compute under ``pl.when``, so the
# pass costs what the scene needs, not what the static band allows; the
# static band is only the guaranteed-coverage capacity. All-invalid tail
# blocks (width 0) cost nothing but their output init.


def _q_spec(tq, rows=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((rows, tq), lambda i, j, s: (0, i),
                        memory_space=pltpu.VMEM)


def _d_spec(rows=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def index_map(i, j, s):
        jc = jnp.minimum(j, jnp.maximum(s[1, i] - 1, 0))
        return (0, s[0, i] + jc)

    return pl.BlockSpec((rows, TD), index_map, memory_space=pltpu.VMEM)


def _grid_spec(tq, n, n_d_tiles, in_specs, out_specs):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tq, n_d_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
    )


@partial(jax.jit, static_argnames=("n_d_tiles", "tq", "ndim"))
def banded_tile_count(query_t8: jax.Array, data_t8: jax.Array,
                      sw_tile: jax.Array, r2, n_d_tiles: int,
                      tq: int = TQ, ndim: int = 3) -> jax.Array:
    """Banded radius count in ONE launch. ``sw_tile`` (2, NBq) int32 is
    each query block's window (start tile, width in tiles)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = query_t8.shape[1]
    r2_arr = jnp.asarray(r2, jnp.float32).reshape(1, 1)

    def kernel(s_ref, r2_ref, q_ref, d_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(j < s_ref[1, i])
        def _():
            dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)
            hits = jnp.sum((dist2 <= r2_ref[0, 0]).astype(jnp.float32),
                           axis=1)
            out_ref[:] += hits[None, :]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid_spec=_grid_spec(
            tq, n, n_d_tiles,
            [pl.BlockSpec((1, 1), lambda i, j, s: (0, 0),
                          memory_space=pltpu.SMEM),
             _q_spec(tq), _d_spec()],
            pl.BlockSpec((1, tq), lambda i, j, s: (0, i),
                         memory_space=pltpu.VMEM)),
    )(sw_tile, r2_arr, query_t8, data_t8)
    return out[0].astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_d_tiles", "tq", "ndim"))
def banded_tile_count3(query_t8: jax.Array, data_t8: jax.Array,
                       sw_tile: jax.Array, levels2: jax.Array,
                       n_d_tiles: int, tq: int = TQ_HEAVY,
                       ndim: int = 3) -> jax.Array:
    """Banded 3-threshold radius count in ONE launch -> (N, 3)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = query_t8.shape[1]
    lvl = jnp.asarray(levels2, jnp.float32).reshape(1, 3)

    def kernel(s_ref, lvl_ref, q_ref, d_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(j < s_ref[1, i])
        def _():
            dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)
            for lv in range(3):
                hits = jnp.sum((dist2 <= lvl_ref[0, lv]).astype(jnp.float32),
                               axis=1)
                out_ref[lv, :] += hits

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, n), jnp.float32),
        grid_spec=_grid_spec(
            tq, n, n_d_tiles,
            [pl.BlockSpec((1, 3), lambda i, j, s: (0, 0),
                          memory_space=pltpu.SMEM),
             _q_spec(tq), _d_spec()],
            pl.BlockSpec((3, tq), lambda i, j, s: (0, i),
                         memory_space=pltpu.VMEM)),
    )(sw_tile, lvl, query_t8, data_t8)
    return out.T.astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_d_tiles", "tq", "ndim"))
def banded_tile_min_label(points_t8: jax.Array, radius2_row: jax.Array,
                          labels_row: jax.Array, sw_tile: jax.Array,
                          n_d_tiles: int, tq: int = TQ_HEAVY,
                          ndim: int = 3) -> jax.Array:
    """Banded mutual-reachability min-label pass in ONE launch.
    radius2_row/labels_row: (N,) float32 aligned with the lanes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = points_t8.shape[1]
    qr2 = radius2_row.reshape(1, n).astype(jnp.float32)
    lab = labels_row.reshape(1, n).astype(jnp.float32)

    def kernel(s_ref, q_ref, d_ref, qr2_ref, dr2_ref, lab_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.full_like(out_ref, float(_BIG_I))

        @pl.when(j < s_ref[1, i])
        def _():
            dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)
            # max-radius joint: see _make_minlabel_kernel
            joint = jnp.maximum(qr2_ref[0][:, None], dr2_ref[0][None, :])
            cand = jnp.where(dist2 <= joint, lab_ref[0][None, :],
                             float(_BIG_I))
            best = jnp.min(cand, axis=1)
            out_ref[:] = jnp.minimum(out_ref[:], best[None, :])

    def row_d_map(i, j, s):
        jc = jnp.minimum(j, jnp.maximum(s[1, i] - 1, 0))
        return (0, s[0, i] + jc)

    row_d = pl.BlockSpec((1, TD), row_d_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid_spec=_grid_spec(
            tq, n, n_d_tiles,
            [_q_spec(tq), _d_spec(),
             pl.BlockSpec((1, tq), lambda i, j, s: (0, i),
                          memory_space=pltpu.VMEM),
             row_d, row_d],
            pl.BlockSpec((1, tq), lambda i, j, s: (0, i),
                         memory_space=pltpu.VMEM)),
    )(sw_tile, points_t8, points_t8, qr2, qr2, lab)
    return out[0]


@partial(jax.jit, static_argnames=("n_d_tiles", "tq", "ndim"))
def banded_tile_nearest(query_t8: jax.Array, data_t8: jax.Array,
                        sw_tile: jax.Array, n_d_tiles: int,
                        tq: int = TQ, ndim: int = 3):
    """Banded nearest-within-window in ONE launch -> (dist2, global idx)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = query_t8.shape[1]

    def kernel(s_ref, q_ref, d_ref, dist_ref, idx_ref):
        i, j = pl.program_id(0), pl.program_id(1)

        @pl.when(j == 0)
        def _():
            dist_ref[:] = jnp.full_like(dist_ref, jnp.inf)
            idx_ref[:] = jnp.zeros_like(idx_ref)

        @pl.when(j < s_ref[1, i])
        def _():
            dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)
            bd = jnp.min(dist2, axis=1)
            base = (s_ref[0, i] + j) * TD
            bi = (jnp.argmin(dist2, axis=1).astype(jnp.float32)
                  + base.astype(jnp.float32))
            take = bd[None, :] < dist_ref[:]
            idx_ref[:] = jnp.where(take, bi[None, :], idx_ref[:])
            dist_ref[:] = jnp.where(take, bd[None, :], dist_ref[:])

    dist, idx = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.float32)),
        grid_spec=_grid_spec(
            tq, n, n_d_tiles,
            [_q_spec(tq), _d_spec()],
            (pl.BlockSpec((1, tq), lambda i, j, s: (0, i),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((1, tq), lambda i, j, s: (0, i),
                          memory_space=pltpu.VMEM))),
    )(sw_tile, query_t8, data_t8)
    return dist[0], idx[0].astype(jnp.int32)


# ---------------------------------------------------------------------------
# nearest neighbor (min distance + index)
# ---------------------------------------------------------------------------

def _make_nearest_kernel(ndim):
    def _nearest_kernel(q_ref, d_ref, dist_ref, idx_ref):
        from jax.experimental import pallas as pl

        j = pl.program_id(1)
        dist2 = _dist2_tile(q_ref[:], d_ref[:], ndim)
        bd = jnp.min(dist2, axis=1)
        bi = jnp.argmin(dist2, axis=1).astype(jnp.float32) + jnp.float32(j * TD)

        @pl.when(j == 0)
        def _():
            dist_ref[:] = jnp.full_like(dist_ref, jnp.inf)
            idx_ref[:] = jnp.zeros_like(idx_ref)

        take = bd[None, :] < dist_ref[:]
        idx_ref[:] = jnp.where(take, bi[None, :], idx_ref[:])
        dist_ref[:] = jnp.where(take, bd[None, :], dist_ref[:])
    return _nearest_kernel


@partial(jax.jit, static_argnames=("ndim",))
def tile_nearest(query_t8: jax.Array, data_t8: jax.Array, ndim: int = 3):
    """Nearest data point per query: (dist2 (N,), idx (N,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = query_t8.shape[1], data_t8.shape[1]
    dist, idx = pl.pallas_call(
        _make_nearest_kernel(ndim),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.float32)),
        grid=(n // TQ, d // TD),
        in_specs=[pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, TD), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, TQ), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TQ), lambda i, j: (0, i),
                                memory_space=pltpu.VMEM)),
    )(query_t8, data_t8)
    return dist[0], idx[0].astype(jnp.int32)
