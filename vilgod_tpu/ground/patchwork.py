"""Patchwork++-style ground segmentation, TPU-native.

A from-scratch JAX implementation of the algorithm of the reference's
adapted Patchwork++ fork (`/root/reference/third_party/patchwork-plusplus/
patchworkpp/src/patchworkpp.cpp`, Lee et al., IROS 2022):

- RNR reflected-noise removal (patchworkpp.cpp:378-401);
- Concentric Zone Model binning, 4 zones x {2,4,4,4} rings x
  {16,32,54,32} sectors (patchworkpp.h:100-130, patchworkpp.cpp:579-623);
- per-patch z-sort + R-VPF vertical-plane removal + R-GPF iterative PCA
  ground fit, 3 iterations (patchworkpp.cpp:468-550);
- GLE gating on uprightness / elevation / flatness / heading
  (patchworkpp.cpp:236-283);
- TGR temporal ground revert via ring flatness statistics
  (patchworkpp.cpp:403-465);
- A-GLE adaptive thresholds incl. sensor-height self-calibration carried
  across frames (patchworkpp.cpp:339-376) — here explicit scan state.

Design differences from the C++ (intentional, TPU-first):
- all 504 patches are processed in parallel (vmap) over fixed-capacity
  z-sorted point buffers instead of nested sequential loops;
- per-patch buffer overflow keeps the ``patch_capacity`` *lowest-z* points
  for fitting; overflowed points are classified against the final patch
  plane (the fit is seeded from the lowest points anyway);
- TGR flatness statistics are computed per concentric ring; the C++
  accumulator leaks values across candidate-free rings within a zone,
  which we do not replicate;
- A-GLE history is a fixed ring buffer (same 1000-sample window) and
  thresholds only update once >= 2 samples exist (the C++ computes
  mean=0/std=0 for a single sample, which would zero the sensor height).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GroundConfig(NamedTuple):
    """Static algorithm parameters (hashable -> usable under jit).

    Defaults mirror patchworkpp.h:75-107 with the pipeline's overrides
    (min_range=1.5, zero_shot_detector.py:129-140).
    """
    enable_rnr: bool = True
    enable_rvpf: bool = True
    enable_tgr: bool = True
    num_iter: int = 3
    num_lpr: int = 20
    num_min_pts: int = 10
    num_rings_of_interest: int = 4
    rnr_ver_angle_thr: float = -15.0
    rnr_intensity_thr: float = 0.2
    sensor_height: float = 1.723
    th_seeds: float = 0.125
    th_dist: float = 0.125
    th_seeds_v: float = 0.25
    th_dist_v: float = 0.1
    max_range: float = 80.0
    min_range: float = 1.5
    uprightness_thr: float = 0.707
    adaptive_seed_selection_margin: float = -1.2
    num_sectors_each_zone: tuple = (16, 32, 54, 32)
    num_rings_each_zone: tuple = (2, 4, 4, 4)
    max_storage: int = 1000
    patch_capacity: int = 1024


def ground_config_from_cfg(cfg, **overrides) -> GroundConfig:
    """Build from the ``preprocessor.ground`` config subtree."""
    g = cfg.preprocessor.ground
    kw = dict(
        enable_rnr=g.enable_rnr, enable_rvpf=g.enable_rvpf, enable_tgr=g.enable_tgr,
        num_iter=g.num_iter, num_lpr=g.num_lpr, num_min_pts=g.num_min_pts,
        num_rings_of_interest=g.num_rings_of_interest,
        rnr_ver_angle_thr=g.rnr_ver_angle_thr, rnr_intensity_thr=g.rnr_intensity_thr,
        sensor_height=g.sensor_height, th_seeds=g.th_seeds, th_dist=g.th_dist,
        th_seeds_v=g.th_seeds_v, th_dist_v=g.th_dist_v,
        max_range=g.max_range, min_range=g.min_range,
        uprightness_thr=g.uprightness_thr,
        adaptive_seed_selection_margin=g.adaptive_seed_selection_margin,
        num_sectors_each_zone=tuple(g.num_sectors_each_zone),
        num_rings_each_zone=tuple(g.num_rings_each_zone),
        max_storage=g.max_storage,
        patch_capacity=cfg.capacity.patch_capacity,
    )
    kw.update(overrides)
    return GroundConfig(**kw)


class GroundState(NamedTuple):
    """A-GLE / TGR adaptive state threaded across frames (pytree)."""
    sensor_height: jax.Array          # scalar
    elevation_thr: jax.Array          # (R,) R = num_rings_of_interest
    flatness_thr: jax.Array           # (R,)
    elev_buf: jax.Array               # (R, S)
    elev_cnt: jax.Array               # (R,)
    elev_ptr: jax.Array               # (R,)
    flat_buf: jax.Array               # (R, S)
    flat_cnt: jax.Array               # (R,)
    flat_ptr: jax.Array               # (R,)


def init_ground_state(cfg: GroundConfig) -> GroundState:
    r, s = cfg.num_rings_of_interest, cfg.max_storage
    zeros_r = jnp.zeros(r, jnp.float32)
    zeros_i = jnp.zeros(r, jnp.int32)
    return GroundState(
        sensor_height=jnp.asarray(cfg.sensor_height, jnp.float32),
        elevation_thr=zeros_r, flatness_thr=zeros_r,
        elev_buf=jnp.zeros((r, s), jnp.float32), elev_cnt=zeros_i, elev_ptr=zeros_i,
        flat_buf=jnp.zeros((r, s), jnp.float32), flat_cnt=zeros_i, flat_ptr=zeros_i,
    )


# ---------------------------------------------------------------------------
# CZM geometry (static numpy precomputation)
# ---------------------------------------------------------------------------

def _czm_geometry(cfg: GroundConfig):
    nz = len(cfg.num_rings_each_zone)
    min_r, max_r = cfg.min_range, cfg.max_range
    min_ranges = [
        min_r,
        (7 * min_r + max_r) / 8.0,
        (3 * min_r + max_r) / 4.0,
        (min_r + max_r) / 2.0,
    ]
    ring_sizes = [
        (min_ranges[1] - min_ranges[0]) / cfg.num_rings_each_zone[0],
        (min_ranges[2] - min_ranges[1]) / cfg.num_rings_each_zone[1],
        (min_ranges[3] - min_ranges[2]) / cfg.num_rings_each_zone[2],
        (max_r - min_ranges[3]) / cfg.num_rings_each_zone[3],
    ]
    sector_sizes = [2 * math.pi / n for n in cfg.num_sectors_each_zone]

    patch_zone, patch_conc = [], []
    conc = 0
    for z in range(nz):
        for ring in range(cfg.num_rings_each_zone[z]):
            for sec in range(cfg.num_sectors_each_zone[z]):
                patch_zone.append(z)
                patch_conc.append(conc)
            conc += 1
    return (
        np.asarray(min_ranges, np.float32),
        np.asarray(ring_sizes, np.float32),
        np.asarray(sector_sizes, np.float32),
        np.asarray(patch_zone, np.int32),
        np.asarray(patch_conc, np.int32),
    )


def _num_patches(cfg: GroundConfig) -> int:
    return int(sum(r * s for r, s in
                   zip(cfg.num_rings_each_zone, cfg.num_sectors_each_zone)))


def _point_patch_ids(xyz: jax.Array, cfg: GroundConfig) -> jax.Array:
    """Per-point patch id, -1 for out-of-range points (pc2czm,
    patchworkpp.cpp:579-623)."""
    min_ranges, ring_sizes, sector_sizes, _, _ = _czm_geometry(cfg)
    nz = len(cfg.num_rings_each_zone)
    zone_offsets = np.concatenate(
        [[0], np.cumsum([r * s for r, s in zip(cfg.num_rings_each_zone,
                                               cfg.num_sectors_each_zone)])]
    )[:nz].astype(np.int32)

    x, y = xyz[:, 0], xyz[:, 1]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x)
    theta = jnp.where(theta > 0, theta, 2 * jnp.pi + theta)

    boundaries = jnp.asarray(
        np.concatenate([min_ranges[1:], [cfg.max_range]]), xyz.dtype)
    zone = jnp.sum(r[:, None] >= boundaries[None, :3], axis=1)  # 0..3

    min_r_z = jnp.asarray(min_ranges)[zone]
    ring_sz = jnp.asarray(ring_sizes)[zone]
    sec_sz = jnp.asarray(sector_sizes)[zone]
    n_rings = jnp.asarray(np.asarray(cfg.num_rings_each_zone, np.int32))[zone]
    n_secs = jnp.asarray(np.asarray(cfg.num_sectors_each_zone, np.int32))[zone]

    ring = jnp.minimum(((r - min_r_z) / ring_sz).astype(jnp.int32), n_rings - 1)
    sec = jnp.minimum((theta / sec_sz).astype(jnp.int32), n_secs - 1)
    patch = jnp.asarray(zone_offsets)[zone] + ring * n_secs + sec
    in_range = (r > cfg.min_range) & (r <= cfg.max_range)
    return jnp.where(in_range, patch, -1)


# ---------------------------------------------------------------------------
# per-patch plane machinery
# ---------------------------------------------------------------------------

def _eigh3_smallest(a: jax.Array):
    """Closed-form symmetric 3x3 eigendecomposition: eigenvalues
    ascending plus the eigenvector of the smallest one.

    Trigonometric method (Smith 1961) + cross-product eigenvector —
    ~40 flops, fully vectorizable. XLA's iterative ``eigh`` dominated the
    whole ground stage (~43% of segment_sequence on v5e at 7 batched
    504-patch solves per frame); patch covariances are tiny and
    well-scaled, so the analytic form is plenty accurate (the C++ oracle
    itself uses a hand-rolled Jacobi)."""
    q = jnp.trace(a) / 3.0
    a_q = a - q * jnp.eye(3, dtype=a.dtype)
    p = jnp.sqrt(jnp.maximum(jnp.sum(a_q * a_q) / 6.0, 0.0))
    b = a_q / jnp.maximum(p, 1e-20)
    r = jnp.clip(jnp.linalg.det(b) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    evals = jnp.stack([e_lo, e_mid, e_hi])

    m = a - e_lo * jnp.eye(3, dtype=a.dtype)
    cands = jnp.stack([jnp.cross(m[0], m[1]), jnp.cross(m[0], m[2]),
                       jnp.cross(m[1], m[2])])
    norms = jnp.sum(cands * cands, axis=1)
    v = cands[jnp.argmax(norms)]
    vn = jnp.sqrt(jnp.sum(v * v))
    up = jnp.asarray([0.0, 0.0, 1.0], a.dtype)
    # degenerate patches: (a) isotropic / rank-0 covariance, or (b) the
    # two smallest eigenvalues nearly equal — there the cross products of
    # (A - e_lo I) rows are all tiny and the picked direction is noise
    # relative to the iterative eigh this replaced, so fall back to +z
    # (what an empty-patch fit yields; such a near-isotropic "plane" is
    # rejected by the uprightness gate anyway). Thresholds scale with the
    # spectrum so absolute covariance magnitude doesn't matter.
    scale = jnp.maximum(jnp.trace(a), 1e-20)
    distinct = (e_mid - e_lo) > 1e-6 * scale
    v = jnp.where((p > 1e-12 * scale) & (vn > 1e-12) & distinct,
                  v / jnp.maximum(vn, 1e-20), up)
    return evals, v


def _pca_plane(pts: jax.Array, sel: jax.Array):
    """Masked PCA plane (normal +z, mean, d, eigenvalues ascending).
    Mirrors estimate_plane (patchworkpp.cpp:48-76)."""
    cnt = jnp.sum(sel)
    n = jnp.maximum(cnt, 1)
    mean = jnp.sum(jnp.where(sel[:, None], pts, 0.0), axis=0) / n
    centered = jnp.where(sel[:, None], pts - mean, 0.0)
    cov = centered.T @ centered / jnp.maximum(n - 1, 1)
    eigvals, normal = _eigh3_smallest(cov)
    normal = jnp.where(normal[2] < 0, -normal, normal)
    d = -normal @ mean
    return normal, mean, d, jnp.maximum(eigvals, 0.0), cnt


def _select_seeds(z: jax.Array, active: jax.Array, is_zone0: jax.Array,
                  th_seed, sensor_height, cfg: GroundConfig):
    """Seed selection over z-sorted patch points
    (extract_initial_seeds, patchworkpp.cpp:78-150)."""
    margin = cfg.adaptive_seed_selection_margin * sensor_height
    skip = is_zone0 & (z < margin)
    cand = active & ~skip
    rank = jnp.cumsum(cand.astype(jnp.int32))
    lpr_sel = cand & (rank <= cfg.num_lpr)
    cnt = jnp.sum(lpr_sel)
    lpr = jnp.sum(jnp.where(lpr_sel, z, 0.0)) / jnp.maximum(cnt, 1)
    lpr = jnp.where(cnt > 0, lpr, 0.0)
    return active & (z < lpr + th_seed)


def _extract_piecewise(pts: jax.Array, valid: jax.Array, is_zone0: jax.Array,
                       sensor_height, cfg: GroundConfig):
    """R-VPF + R-GPF for one patch (extract_piecewiseground,
    patchworkpp.cpp:468-550). pts (P, 3) z-sorted ascending; returns
    (ground_sel, removed_vertical, normal, mean, d, eigvals, n_ground)."""
    z = pts[:, 2]

    removed = jnp.zeros_like(valid)
    if cfg.enable_rvpf:
        def rvpf_body(_, carry):
            removed, stop = carry
            active = valid & ~removed
            seeds = _select_seeds(z, active, is_zone0, cfg.th_seeds_v,
                                  sensor_height, cfg)
            normal, mean, d, _, cnt = _pca_plane(pts, seeds)
            is_vertical = is_zone0 & (normal[2] < cfg.uprightness_thr) & ~stop & (cnt > 0)
            dist = pts @ normal + d
            rm = is_vertical & (jnp.abs(dist) < cfg.th_dist_v) & active
            return removed | rm, stop | ~is_vertical

        removed, _ = jax.lax.fori_loop(
            0, cfg.num_iter, rvpf_body, (removed, jnp.asarray(False)))

    active = valid & ~removed
    seeds = _select_seeds(z, active, is_zone0, cfg.th_seeds, sensor_height, cfg)
    normal, mean, d, eig, cnt = _pca_plane(pts, seeds)

    def gpf_body(_, carry):
        normal, mean, d, eig, prev_cnt = carry
        dist = pts @ normal + d
        ground = active & (dist < cfg.th_dist)
        n2, m2, d2, e2, cnt2 = _pca_plane(pts, ground)
        # empty ground keeps the previous plane (estimate_plane early-return)
        keep = cnt2 > 0
        normal = jnp.where(keep, n2, normal)
        mean = jnp.where(keep, m2, mean)
        d = jnp.where(keep, d2, d)
        eig = jnp.where(keep, e2, eig)
        return normal, mean, d, eig, cnt2

    normal, mean, d, eig, _ = jax.lax.fori_loop(
        0, cfg.num_iter, gpf_body, (normal, mean, d, eig, cnt))
    # ground membership as classified by the pre-final plane: re-derive it by
    # running the classify step once more with the plane *before* the final
    # fit is unavailable here; instead classify with the final plane — the
    # final fit is computed on exactly this set, so membership is identical
    # up to fit convergence (num_iter=3 saturates for real patches).
    dist = pts @ normal + d
    ground = active & (dist < cfg.th_dist)
    return ground, removed, normal, mean, d, eig, jnp.sum(ground)


# ---------------------------------------------------------------------------
# main per-frame kernel
# ---------------------------------------------------------------------------

def _presort_frame(points: jax.Array, mask: jax.Array, cfg: GroundConfig):
    """State-free patch ordering for one frame: per-point patch id and
    the (pid, z, index)-lexicographic sort. This is the single most
    expensive op in ground segmentation and does NOT depend on the
    A-GLE/TGR state, so :func:`segment_sequence` hoists it out of the
    sequential frame scan and batches it over all frames (one batched
    sort instead of F dispatches). Noise (RNR) points still sort into
    their patch run here; the state-dependent pass skips them by rank.

    x/y ride the sort as extra operands so the scan gets the SORTED
    cloud for free: the patch tables then fill by scatter of point
    values instead of an index scatter + 516k-slot gather (the gather
    was ~2/3 of the whole scan's cost — random accesses run ~6 ns/elem
    and the index table touched every padded slot)."""
    n = points.shape[0]
    num_patches = _num_patches(cfg)
    xyz = points[:, :3]
    pid_geo = _point_patch_ids(xyz, cfg)
    key = jnp.where(mask & (pid_geo >= 0), pid_geo,
                    num_patches).astype(jnp.int32)
    sorted_key, z_s, order, x_s, y_s = jax.lax.sort(
        [key, xyz[:, 2], jnp.arange(n, dtype=jnp.int32),
         xyz[:, 0], xyz[:, 1]], num_keys=3)
    starts = jnp.searchsorted(sorted_key,
                              jnp.arange(num_patches)).astype(jnp.int32)
    xyz_sorted = jnp.stack([x_s, y_s, z_s], axis=1)
    return pid_geo, sorted_key, order, starts, xyz_sorted


def _segment_presorted(points: jax.Array, mask: jax.Array,
                       state: GroundState, cfg: GroundConfig,
                       pid_geo, sorted_key, order, starts, xyz_sorted):
    """State-dependent part of :func:`segment_ground` over a presorted
    frame (see :func:`_presort_frame`)."""
    n = points.shape[0]
    num_patches = _num_patches(cfg)
    cap = cfg.patch_capacity
    _, _, _, patch_zone_np, patch_conc_np = _czm_geometry(cfg)
    patch_zone = jnp.asarray(patch_zone_np)
    patch_conc = jnp.asarray(patch_conc_np)

    xyz = points[:, :3]
    intensity = points[:, 3] if points.shape[1] > 3 else jnp.zeros(n, points.dtype)

    # ---- RNR (patchworkpp.cpp:378-401) ----
    if cfg.enable_rnr:
        r = jnp.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
        ver_angle = jnp.arctan2(xyz[:, 2], r) * (180.0 / jnp.pi)
        noise = (
            (ver_angle < cfg.rnr_ver_angle_thr)
            & (xyz[:, 2] < -state.sensor_height - 0.8)
            & (intensity < cfg.rnr_intensity_thr)
        )
    else:
        noise = jnp.zeros(n, bool)

    usable = mask & ~noise
    patch_ids = jnp.where(usable, pid_geo, -1)

    # ---- z-sorted per-patch tables from the presorted runs ----
    # noise points occupy run slots but must not claim table positions:
    # rank among non-noise entries of the patch replaces the plain
    # within-run offset (bit-identical to sorting the usable set alone).
    # Point VALUES scatter straight from the presorted cloud — no index
    # table, no (num_patches * cap)-slot gather (random accesses are the
    # scan's dominant cost; the value scatter touches only real points)
    nz = (sorted_key < num_patches) & ~noise[order]
    cum = jnp.cumsum(nz.astype(jnp.int32))
    start_of = starts[jnp.minimum(sorted_key, num_patches - 1)]
    cum_before = jnp.where(start_of > 0, cum[jnp.maximum(start_of - 1, 0)], 0)
    pos = cum - 1 - cum_before
    in_table = nz & (pos < cap)
    flat = jnp.where(in_table, sorted_key * cap + pos, num_patches * cap)
    # ONE int32 index scatter + a row gather instead of scattering the
    # 3 float columns: scatter cost scales with scattered width on the
    # v5e (measured 7.2 ms for the 3-col float scatter vs 1.0 ms for
    # idx-scatter + gather at bench occupancy), and the gather rows are
    # contiguous patch runs of the presorted cloud, so it vectorizes.
    idx_tab = (
        jnp.full(num_patches * cap + 1, n, jnp.int32)
        .at[flat].set(jnp.where(in_table, jnp.arange(n, dtype=jnp.int32), n))
        [: num_patches * cap]
    )
    tab_ok = idx_tab < n
    patch_pts = jnp.where(
        tab_ok[:, None], xyz_sorted[jnp.minimum(idx_tab, n - 1)], 0.0
    ).reshape(num_patches, cap, 3)
    # ranks are contiguous from 0 per patch, so the scattered occupancy
    # IS the mask (rank < min(nz_count, cap)) — no segment_sum needed
    table_mask = tab_ok.reshape(num_patches, cap)

    patch_n_pts = jax.ops.segment_sum(
        jnp.where(patch_ids >= 0, 1, 0), jnp.where(patch_ids >= 0, patch_ids, 0),
        num_segments=num_patches)

    # ---- per-patch piecewise ground extraction (vmapped) ----
    is_zone0 = patch_zone == 0
    ground_sel, removed_v, normals, means, ds, eigs, n_ground = jax.vmap(
        lambda p, v, z0: _extract_piecewise(p, v, z0, state.sensor_height, cfg)
    )(patch_pts, table_mask, is_zone0)

    # ---- GLE gating (patchworkpp.cpp:215-283) ----
    enough = patch_n_pts >= cfg.num_min_pts
    uprightness = normals[:, 2]
    elevation = means[:, 2]
    flatness = eigs[:, 0]
    line_variable = jnp.where(eigs[:, 1] > 0, eigs[:, 2] / jnp.maximum(eigs[:, 1], 1e-12), 1e12)
    heading = jnp.sum(means * normals, axis=1)

    near = patch_conc < cfg.num_rings_of_interest
    conc_clamped = jnp.minimum(patch_conc, cfg.num_rings_of_interest - 1)
    is_upright = uprightness > cfg.uprightness_thr
    is_not_elevated = near & (elevation < state.elevation_thr[conc_clamped])
    is_flat = near & (flatness < state.flatness_thr[conc_clamped])
    is_heading_out = heading < 0.0

    store = enough & is_upright & is_not_elevated & near

    patch_ground = enough & is_upright & (
        ~near | (is_heading_out & (is_not_elevated | is_flat))
    )
    candidate = enough & is_upright & near & is_heading_out & ~(is_not_elevated | is_flat)

    # ---- TGR (patchworkpp.cpp:403-465) ----
    if cfg.enable_tgr:
        ring_of = jnp.where(near, patch_conc, cfg.num_rings_of_interest)
        num_r = cfg.num_rings_of_interest
        f_sum = jax.ops.segment_sum(jnp.where(store, flatness, 0.0), ring_of,
                                    num_segments=num_r + 1)[:num_r]
        f_cnt = jax.ops.segment_sum(jnp.where(store, 1.0, 0.0), ring_of,
                                    num_segments=num_r + 1)[:num_r]
        f_mean = f_sum / jnp.maximum(f_cnt, 1)
        f_sq = jax.ops.segment_sum(jnp.where(store, flatness**2, 0.0), ring_of,
                                   num_segments=num_r + 1)[:num_r]
        f_var = (f_sq - f_cnt * f_mean**2) / jnp.maximum(f_cnt - 1, 1)
        f_std = jnp.sqrt(jnp.maximum(f_var, 0.0))
        # calc_mean_stdev leaves (0, 0) for <2 samples
        f_mean = jnp.where(f_cnt >= 2, f_mean, 0.0)
        f_std = jnp.where(f_cnt >= 2, f_std, 0.0)

        mu = f_mean[conc_clamped] + 1.5 * f_std[conc_clamped]
        prob_flatness = 1.0 / (1.0 + jnp.exp((flatness - mu) / jnp.maximum(mu / 10, 1e-12)))
        prob_flatness = jnp.where(mu > 0, prob_flatness, 0.0)
        prob_flatness = jnp.where(
            (n_ground > 1500) & (flatness < cfg.th_dist**2), 1.0, prob_flatness)
        prob_line = jnp.where(line_variable > 8.0, 0.0, 1.0)
        revert = candidate & (prob_line * prob_flatness > 0.5)
        patch_ground = patch_ground | revert

    # ---- point-level assembly (sorted domain: rank -> grid gather,
    # then ONE unsort scatter over real points) ----
    gv_flat = (ground_sel & patch_ground[:, None]).reshape(-1)
    pg_sorted = in_table & gv_flat[jnp.minimum(flat, num_patches * cap - 1)]
    # one packed int8 unsort scatter instead of two bool scatters
    # (pg_sorted implies in_table, so code 0/1/2 losslessly carries both)
    code = jnp.zeros(n, jnp.int8).at[order].set(
        in_table.astype(jnp.int8) + pg_sorted.astype(jnp.int8))
    point_patch_ground = code == 2
    # overflowed points (valid, in a patch, but not in the table):
    covered = code >= 1
    overflow = usable & (patch_ids >= 0) & ~covered
    pid_safe = jnp.maximum(patch_ids, 0)
    dist_overflow = jnp.sum(xyz * normals[pid_safe], axis=1) + ds[pid_safe]
    overflow_ground = overflow & patch_ground[pid_safe] & (dist_overflow < cfg.th_dist)

    ground = point_patch_ground | overflow_ground

    # ---- A-GLE state update (patchworkpp.cpp:339-376) ----
    new_state = _update_state(state, store, elevation, flatness, conc_clamped, cfg)

    aux = {
        "patch_ground": patch_ground,
        "normals": normals,
        "means": means,
        "n_ground": n_ground,
        "noise": noise,
    }
    return ground, new_state, aux


@partial(jax.jit, static_argnames=("cfg",))
def segment_ground(points: jax.Array, mask: jax.Array, state: GroundState,
                   cfg: GroundConfig):
    """Segment one frame.

    points: (N, 4+) = [x, y, z, intensity, ...] in *sensor* frame, already
    z-offset corrected by the caller (mask_ground_points applies
    ``z -= z_offset`` before calling, pointcloud_utils.py:49-56).
    mask: (N,) validity.

    Returns (ground (N,) bool, new_state, aux dict).
    """
    return _segment_presorted(points, mask, state, cfg,
                              *_presort_frame(points, mask, cfg))


def _ring_buffer_append(buf, cnt, ptr, values, sel, max_storage):
    """Append masked ``values`` (per ring) into ring buffers.

    buf (R, S); values (P,), sel (P,) with ring ids ``ring`` implicit via
    caller providing per-ring masks. Here we handle one ring at a time via
    vmap from the caller.
    """
    k = jnp.cumsum(sel.astype(jnp.int32)) - 1  # position among selected
    write_pos = (ptr + k) % max_storage
    idx = jnp.where(sel, write_pos, max_storage)
    buf = jnp.concatenate([buf, jnp.zeros((1,), buf.dtype)])
    buf = buf.at[idx].set(jnp.where(sel, values, 0.0))[:max_storage]
    n_new = jnp.sum(sel)
    return buf, jnp.minimum(cnt + n_new, max_storage), (ptr + n_new) % max_storage


def _update_state(state: GroundState, store, elevation, flatness, ring, cfg):
    num_r = cfg.num_rings_of_interest

    def per_ring(r, buf, cnt, ptr, values):
        sel = store & (ring == r)
        return _ring_buffer_append(buf, cnt, ptr, values, sel, cfg.max_storage)

    elev_buf, elev_cnt, elev_ptr = [], [], []
    flat_buf, flat_cnt, flat_ptr = [], [], []
    for r in range(num_r):
        b, c, p = per_ring(r, state.elev_buf[r], state.elev_cnt[r],
                           state.elev_ptr[r], elevation)
        elev_buf.append(b), elev_cnt.append(c), elev_ptr.append(p)
        b, c, p = per_ring(r, state.flat_buf[r], state.flat_cnt[r],
                           state.flat_ptr[r], flatness)
        flat_buf.append(b), flat_cnt.append(c), flat_ptr.append(p)

    elev_buf = jnp.stack(elev_buf)
    elev_cnt = jnp.stack(elev_cnt)
    elev_ptr = jnp.stack(elev_ptr)
    flat_buf = jnp.stack(flat_buf)
    flat_cnt = jnp.stack(flat_cnt)
    flat_ptr = jnp.stack(flat_ptr)

    def stats(buf, cnt):
        m = (jnp.arange(cfg.max_storage)[None, :] < cnt[:, None])
        mean = jnp.sum(jnp.where(m, buf, 0.0), axis=1) / jnp.maximum(cnt, 1)
        var = jnp.sum(jnp.where(m, (buf - mean[:, None]) ** 2, 0.0), axis=1) / jnp.maximum(cnt - 1, 1)
        return mean, jnp.sqrt(jnp.maximum(var, 0.0))

    e_mean, e_std = stats(elev_buf, elev_cnt)
    f_mean, f_std = stats(flat_buf, flat_cnt)

    mult = jnp.asarray([3.0] + [2.0] * (num_r - 1), jnp.float32)
    new_elev_thr = jnp.where(elev_cnt >= 2, e_mean + mult * e_std, state.elevation_thr)
    new_flat_thr = jnp.where(flat_cnt >= 2, f_mean + f_std, state.flatness_thr)
    new_height = jnp.where(elev_cnt[0] >= 2, -e_mean[0], state.sensor_height)

    return GroundState(
        sensor_height=new_height,
        elevation_thr=new_elev_thr,
        flatness_thr=new_flat_thr,
        elev_buf=elev_buf, elev_cnt=elev_cnt, elev_ptr=elev_ptr,
        flat_buf=flat_buf, flat_cnt=flat_cnt, flat_ptr=flat_ptr,
    )


@partial(jax.jit, static_argnames=("cfg",))
def segment_sequence(points: jax.Array, mask: jax.Array, cfg: GroundConfig,
                     z_offset: float = 0.0):
    """Scan ground segmentation over a frame sequence.

    points: (F, N, 4+) sensor-frame; mask: (F, N).
    The z offset mirrors mask_ground_points_patchwork_pp
    (pointcloud_utils.py:49-56). Returns (ground (F, N) bool, final state).
    """
    points = points.at[:, :, 2].add(-z_offset)
    # the expensive (pid, z, idx) sort is state-free: ONE batched sort
    # over all frames, leaving only the cheap state-threaded extraction
    # in the sequential scan
    presorted = jax.vmap(lambda p, m: _presort_frame(p, m, cfg))(points, mask)

    def step(state, inp):
        pts, m, pre = inp
        g, state, _ = _segment_presorted(pts, m, state, cfg, *pre)
        return state, g

    state = init_ground_state(cfg)
    state, ground = jax.lax.scan(step, state, (points, mask, presorted))
    return ground, state


@partial(jax.jit, static_argnames=("cfg", "chains"))
def segment_sequence_chained(points: jax.Array, mask: jax.Array,
                             cfg: GroundConfig, z_offset: float,
                             chains: int):
    """:func:`segment_sequence` as ``chains`` concurrent sub-scans on ONE
    device (vmap over frame chunks), each with its own A-GLE/TGR warmup.

    The same trade `parallel.sharded_ground` makes across a mesh, applied
    within a device: the scan's per-step work is tiny (504 patches of
    3x3 PCA), so k chained chunks batch k frames per step and cut the
    sequential step count k-fold. Exactness contract matches
    sharded_ground: ``chained == concat(per-chunk full scans)``; the
    first frames of each chunk see un-adapted thresholds exactly like
    frame 0 of any scan does.

    MEASURED SLOWER on the v5e (r5): 2.78 s vs 1.52 s for the plain
    scan at 96 x 155k points — the scan is one compiled program (no
    per-step dispatch to amortize) and the vmapped scatter/gather table
    build costs more than the step-count reduction saves. Kept for
    hardware where the trade flips (and as the single-device mirror of
    the sharded_ground contract); enable via cfg
    ``parallel.ground_chains``, default off.
    """
    f = points.shape[0]
    assert f % chains == 0, (f, chains)
    pts = points.reshape(chains, f // chains, *points.shape[1:])
    msk = mask.reshape(chains, f // chains, mask.shape[1])
    ground = jax.vmap(
        lambda p, m: segment_sequence(p, m, cfg, z_offset)[0])(pts, msk)
    return ground.reshape(f, mask.shape[1])
