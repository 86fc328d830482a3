"""Geometry pipeline stages: ground masking, entropy, clustering, filters.

TPU-native re-implementations of the reference orchestrator's stages 1-4
(`/root/reference/src/vilgod/zero_shot_detector.py:129-297`). Each stage
is a pure function ``stage(state, cfg, **args)`` over the device-resident
:class:`SequenceState` buffers; the raw cloud uploads once (quantized)
and every derived per-point buffer is born on device — only the tiny
per-detection tables cross the 36 MB/s host tunnel between stages.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ground.patchwork import ground_config_from_cfg, segment_sequence
from ..ops import segment as seg_ops
from ..ops.cluster import compact_labels, dbscan_labels
from ..ops.entropy import entropy_sequence
from ..ops.neighbors import knn_labels, radius_count_self
from ..ops.plane import fit_ground_plane
from .state import SequenceState


def frame_bucket(n_frames: int, bucket: int = 8) -> int:
    """Round the frame count up to a bucket so whole-sequence device
    programs compile once per bucket, not once per sequence length.
    Granularity 8 wastes at most 7 frames of compute/upload per
    sequence (Waymo sequences are ~199 frames -> < 4%); the compile
    variants stay bounded and cache persistently."""
    return max(-(-n_frames // bucket) * bucket, bucket)


def _transforms_to_ref(state: SequenceState, f_pad: int) -> np.ndarray:
    t = np.stack([state.transform_to_ref(f) for f in range(state.n_frames)])
    if f_pad > state.n_frames:
        t = np.concatenate([t, np.tile(np.eye(4, dtype=t.dtype),
                                       (f_pad - state.n_frames, 1, 1))])
    return t.astype(np.float32)


# ---------------------------------------------------------------------------
# Stage 1: mask_ground_points  (zero_shot_detector.py:129-151)
# ---------------------------------------------------------------------------

def _compact_frame(points, mask, ground, transform, cap_ng: int):
    """Compact one frame's non-ground points into the front of a fixed
    buffer, in world ("ref") coordinates (lidar_frame.py:66-69). Returns
    (ng_xyz (N, 3), ng_mask (N,), ng_src (N,), count)."""
    p = points.shape[0]
    keep = mask & ~ground
    cnt = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), cap_ng)
    pos = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, cap_ng)
    pos = jnp.minimum(pos, cap_ng)
    idx = jnp.arange(p, dtype=jnp.int32)
    src = (jnp.full(cap_ng + 1, -1, jnp.int32)
           .at[pos].set(jnp.where(keep, idx, -1))[:cap_ng])
    valid = src >= 0
    pts_ref = points[:, :3] @ transform[:3, :3].T + transform[:3, 3]
    ng_xyz = jnp.where(valid[:, None], pts_ref[jnp.maximum(src, 0)], 0.0)
    return ng_xyz, valid, src, cnt


@partial(jax.jit, static_argnames=("cap_ng",))
def _compact_sequence_jit(points, mask, ground, transforms, cap_ng):
    # vmap, not lax.map: one batched scatter/cumsum program for all
    # frames instead of F sequential dispatches of small ops
    return jax.vmap(
        lambda p, m, g, t: _compact_frame(p, m, g, t, cap_ng)
    )(points, mask, ground, transforms)


@partial(jax.jit, static_argnames=("gcfg", "cap_ng", "chains"))
def _ground_compact_jit(points, mask, transforms, gcfg, z_offset, cap_ng,
                        chains=1):
    """Ground segmentation + non-ground compaction for the whole sequence
    in ONE device program over the resident (quantized-upload) cloud.

    ``chains > 1`` runs the A-GLE scan as that many concurrent sub-scans
    (ground.patchwork.segment_sequence_chained) — the sharded_ground
    warmup trade applied within one device."""
    if chains > 1:
        from ..ground.patchwork import segment_sequence_chained
        ground = segment_sequence_chained(points, mask, gcfg, z_offset,
                                          chains) & mask
    else:
        ground = segment_sequence(points, mask, gcfg, z_offset)[0] & mask
    ng_xyz, ng_mask, ng_src, cnts = _compact_sequence_jit(
        points, mask, ground, transforms, cap_ng=cap_ng)
    return ground, ng_xyz, ng_mask, ng_src, cnts


def mask_ground_points(state: SequenceState, cfg, min_range: float = 1.5,
                       z_offset: float = 1.723, **_):
    """Patchwork++-style ground segmentation, scanned over frames in ONE
    device program, with the non-ground compaction fused behind it.

    The A-GLE/TGR adaptive state threads across frames exactly like the
    C++ singleton does (patchworkpp.cpp:339-465); the z offset mirrors
    mask_ground_points_patchwork_pp (pointcloud_utils.py:49-56). Nothing
    per-point returns to the host — downstream stages consume the
    device-resident ng buffers; only the (F,) occupancy counts download
    (they pick the shape bucket for the rest of the pipeline).
    """
    if state.done.get("mask_ground_points"):
        return
    gcfg = ground_config_from_cfg(cfg, min_range=min_range)
    f_total = state.n_frames
    f_pad = frame_bucket(f_total)
    n_pts = state.points_bucket()
    cap_ng = state.caps.max_ng_points

    import jax as _jax
    n_dev = _jax.local_device_count()
    # multi-chip path (VERDICT r4 #4 / SURVEY §7 hard part 3): frames
    # shard over dp, each device scanning its chunk with per-shard A-GLE
    # warmup. Gated on chunks big enough for the warmup to settle
    # (>= 8 frames/device; the adaptive thresholds update from frame 2)
    # and its own flag because the result intentionally differs from the
    # single-device scan at chunk heads (see parallel.sharded_ground).
    use_mesh = (n_dev > 1 and f_pad % n_dev == 0 and f_pad // n_dev >= 8
                and cfg.get("parallel", {}).get("shard_frames", True)
                and cfg.get("parallel", {}).get("shard_ground", True))
    if use_mesh:
        from ..parallel import make_mesh, sharded_ground
        mesh = make_mesh(n_dev)
        ground = sharded_ground(
            mesh, state.device("points", f_pad, n_pts),
            state.device("points_mask", f_pad, n_pts), gcfg, z_offset)
        ground = ground & state.device("points_mask", f_pad, n_pts)
        ng_xyz, ng_mask, ng_src, cnts = _compact_sequence_jit(
            state.device("points", f_pad, n_pts),
            state.device("points_mask", f_pad, n_pts),
            ground, jnp.asarray(_transforms_to_ref(state, f_pad)),
            cap_ng=cap_ng)
    else:
        # single-device chained scan (cfg parallel.ground_chains): the
        # same per-chunk warmup trade as the mesh path, batching `chains`
        # frames per scan step. Gated like the mesh path (>= 8 frames
        # per chain so the adaptive thresholds settle).
        chains = int(cfg.get("parallel", {}).get("ground_chains", 1))
        if not (chains > 1 and f_pad % chains == 0
                and f_pad // chains >= 8):
            chains = 1
        ground, ng_xyz, ng_mask, ng_src, cnts = _ground_compact_jit(
            state.device("points", f_pad, n_pts),
            state.device("points_mask", f_pad, n_pts),
            jnp.asarray(_transforms_to_ref(state, f_pad)),
            gcfg, z_offset, cap_ng=cap_ng, chains=chains)
    state.put_device("ground_mask", ground, f_pad, n_pts)
    state.put_device("ng_xyz", ng_xyz, f_pad, cap_ng)
    state.put_device("ng_mask", ng_mask, f_pad, cap_ng)
    state.put_device("ng_src", ng_src, f_pad, cap_ng)
    state._ng_counts = np.asarray(cnts[:f_total])
    state.done["mask_ground_points"] = True


def rebuild_ng_buffers(state: SequenceState):
    """Recompute the device-resident non-ground buffers from the raw
    frames + (checkpoint-loaded) ground masks: cluster points are never
    stored, they re-derive from indices (lidar_frame.py:136-147)."""
    f_total = state.n_frames
    f_pad = frame_bucket(f_total)
    n_pts = state.points_bucket()
    cap_ng = state.caps.max_ng_points
    ng_xyz, ng_mask, ng_src, cnts = _compact_sequence_jit(
        state.device("points", f_pad, n_pts),
        state.device("points_mask", f_pad, n_pts),
        state.device("ground_mask", f_pad, n_pts),
        jnp.asarray(_transforms_to_ref(state, f_pad)), cap_ng=cap_ng)
    state.put_device("ng_xyz", ng_xyz, f_pad, cap_ng)
    state.put_device("ng_mask", ng_mask, f_pad, cap_ng)
    state.put_device("ng_src", ng_src, f_pad, cap_ng)
    state._ng_counts = np.asarray(cnts[:f_total])


# ---------------------------------------------------------------------------
# Stage 2: calculate_entropy_scores  (zero_shot_detector.py:153-195)
# ---------------------------------------------------------------------------

@jax.jit
def _points_ref_all_jit(points, transforms):
    """Full clouds in world ("ref") frame, one batched transform."""
    return jnp.einsum("fnd,fed->fne", points[..., :3],
                      transforms[:, :3, :3]) + transforms[:, None, :3, 3]


def calculate_entropy_scores(state: SequenceState, cfg,
                             n_neighbouring_frames: int = 15,
                             skip_frames: int = 1,
                             max_neighbor_point_dist: float = 0.3,
                             max_neighbor_points: int = 1000,
                             include_ground_points: bool = False,
                             force: bool = False, **_):
    """MODEST-style ephemerality scores over a sliding frame window.

    Window layout matches the reference exactly (zero_shot_detector.py:
    165-184; every ``skip_frames + 1``-th window frame sampled,
    pointcloud_utils.py:74-81). ``include_ground_points`` fills the
    neighbor window with the FULL world-frame cloud instead of the
    non-ground subset (zero_shot_detector.py:158-183) — scored points
    stay the non-ground set so the sparse score indices keep the
    reference's wo_ground alignment (lidar_frame.py:112-118). The whole
    sequence runs as ONE device program over the resident ng buffers;
    the scores stay on device.
    """
    if state.done.get("calculate_entropy_scores") and not force:
        return
    f_total = state.n_frames
    f_pad = frame_bucket(f_total)
    n_ng = state.ng_bucket()
    window = min(n_neighbouring_frames, f_total)

    import jax as _jax
    # local devices only: sequences are per-host under multi-host runs
    # (runner.run_sequences), so stage meshes must be host-local.
    n_dev = _jax.local_device_count()
    # multi-chip path: frames shard over the mesh's dp axis with a
    # halo-exchange for the temporal window (SURVEY §7.8). The sharded
    # program is pad-aware (the padded tail is masked inside the shard
    # body and window starts clamp at the REAL frame count), so real
    # Waymo lengths (199 frames -> bucket 200) take the mesh; the only
    # gates left are divisibility and tail-clamped windows staying within
    # the last device's chunk.
    use_mesh = (n_dev > 1 and f_pad % n_dev == 0
                and f_pad // n_dev >= window
                and (f_pad - f_total) + window <= f_pad // n_dev
                and cfg.get("parallel", {}).get("shard_frames", True))
    if include_ground_points:
        # reference: the neighbor window holds the FULL cloud
        # (points_ref instead of points_ref_wo_ground). Single-device
        # path only — the full-cloud buffer is ~50% larger and this
        # knob is off in every shipped config (preprocessing.yaml:64).
        n_pts = state.points_bucket()
        frame_valid = np.zeros(f_pad, bool)
        frame_valid[:f_total] = True
        full_ref = _points_ref_all_jit(
            state.device("points", f_pad, n_pts),
            jnp.asarray(_transforms_to_ref(state, f_pad)))
        scores = entropy_sequence(
            state.device("ng_xyz", f_pad, n_ng),
            state.device("ng_mask", f_pad, n_ng),
            jnp.asarray(frame_valid),
            window=window,
            skip_frames=skip_frames, radius=max_neighbor_point_dist,
            max_neighbor_points=max_neighbor_points,
            data_frames=full_ref,
            data_masks=state.device("points_mask", f_pad, n_pts))
    elif use_mesh:
        from ..parallel import make_mesh, sharded_entropy
        mesh = make_mesh(n_dev)
        scores = sharded_entropy(
            mesh, state.device("ng_xyz", f_pad, n_ng),
            state.device("ng_mask", f_pad, n_ng),
            f_real=f_total,
            window=window, skip_frames=skip_frames,
            radius=max_neighbor_point_dist,
            max_neighbor_points=max_neighbor_points)
        # gather: downstream single-device programs mix this buffer with
        # device-0 residents (mixed placements reject at dispatch)
        scores = _jax.device_put(scores, _jax.devices()[0])
    else:
        frame_valid = np.zeros(f_pad, bool)
        frame_valid[:f_total] = True
        scores = entropy_sequence(
            state.device("ng_xyz", f_pad, n_ng),
            state.device("ng_mask", f_pad, n_ng),
            jnp.asarray(frame_valid),
            window=window,
            skip_frames=skip_frames, radius=max_neighbor_point_dist,
            max_neighbor_points=max_neighbor_points)
    state.put_device("ng_entropy", scores, f_pad, n_ng)
    state.done["calculate_entropy_scores"] = True


# ---------------------------------------------------------------------------
# Stage 3: spatial_clustering  (zero_shot_detector.py:197-259)
# ---------------------------------------------------------------------------

def _frame_select_stats(ng_xyz, ng_mask, ng_entropy, fnr):
    """Per-frame deterministic selection inputs, computed ONCE per frame
    (each frame appears in up to n_frames_window cluster windows; the
    counts and dense-moving checks are frame properties — only the random
    subsample is drawn per window). Mirrors zero_shot_detector.py:217-228:

    - points with no same-cloud neighbor within 0.2 m are dropped;
    - moving points (entropy < 0.6) re-admit only with >= 2 moving
      neighbors within sqrt(0.1) m (the reference compares *squared* kNN
      distances against 0.1).

    Returns (has_neighbor (N,), dense_moving (N,), entropy_mask (N,))."""
    xyz, m, ent = ng_xyz[fnr], ng_mask[fnr], ng_entropy[fnr]
    counts = radius_count_self(xyz, m, 0.2, max_count=100)
    entropy_mask = m & (ent < 0.6)
    moving_counts = radius_count_self(xyz, entropy_mask, float(np.sqrt(0.1)),
                                      max_count=4)
    return counts >= 1, moving_counts >= 2, entropy_mask


@jax.jit
def frame_select_stats_all(ng_xyz, ng_mask, ng_entropy, frame_valid):
    """All frames' selection stats in ONE device program."""
    def one(f):
        has_nbr, dense_moving, em = _frame_select_stats(
            ng_xyz, ng_mask & frame_valid[:, None], ng_entropy, f)
        return has_nbr, dense_moving, em

    return jax.lax.map(one, jnp.arange(ng_xyz.shape[0]))


def select_cluster_input(ng_xyz, ng_mask, ng_entropy, frame_valid, fnr, seed,
                         stats, n_frames_window, cap_in):
    """Build frame ``fnr``'s compacted n-frame 5-D cluster input
    [xyz, entropy, 0.1*frame_offset] (zero_shot_detector.py:208-234).

    The reference's exact ``np.random.choice`` 1/n_frames subsample
    (zero_shot_detector.py:223) becomes a per-point Bernoulli(1/n) draw —
    same expected density, device-side RNG. Shared by the production
    stage and the HDBSCAN fidelity harness (which must test the kernel
    on the features the pipeline actually clusters)."""
    f_total, n = ng_xyz.shape[:2]
    f_real = jnp.sum(frame_valid.astype(jnp.int32))
    base_key = jax.random.PRNGKey(seed)
    lo = jnp.clip(fnr, 0, jnp.maximum(f_real - n_frames_window, 0))

    def frame_feats(rel):
        f = jnp.minimum(lo + rel, f_total - 1)
        valid = frame_valid[f] & (lo + rel == f)
        m = ng_mask[f] & valid
        key = jax.random.fold_in(jax.random.fold_in(base_key, fnr), rel)
        rand_keep = jax.random.uniform(key, (n,)) < (1.0 / n_frames_window)
        has_nbr, dense_moving, entropy_mask = (
            stats[0][f], stats[1][f], stats[2][f])
        em = entropy_mask & valid
        keep = rand_keep & m & has_nbr
        keep = jnp.where(em, dense_moving & m, keep)
        feats = jnp.concatenate(
            [ng_xyz[f], ng_entropy[f][:, None],
             jnp.full((n, 1), rel * 0.1, ng_xyz.dtype)], axis=1)
        return feats, keep

    # vmap, not lax.map: on the axon runtime per-op dispatch dominates
    # small ops, so one batched op beats n_frames_window sequential ones
    feats, keep = jax.vmap(frame_feats)(jnp.arange(n_frames_window))
    feats = feats.reshape(n_frames_window * n, 5)
    keep = keep.reshape(n_frames_window * n)
    # device-side compaction into the fixed cluster-input buffer
    order = jnp.argsort(~keep, stable=True).astype(jnp.int32)
    features = feats[order[:cap_in]]
    feat_mask = jnp.arange(cap_in) < jnp.sum(keep)
    # provenance per slot: which (frame, ng row) the slot came from —
    # lets the label transfer copy labels straight back to the selected
    # points (their nearest data point is themselves at distance 0), so
    # the kNN pass only scans the UNSELECTED remainder of the cloud
    src_frame = (lo + order[:cap_in] // n).astype(jnp.int32)
    src_index = (order[:cap_in] % n).astype(jnp.int32)
    return features, feat_mask, src_frame, src_index


@partial(jax.jit, static_argnames=("n_frames_window", "cap_in", "eps",
                                   "min_samples", "min_cluster_size",
                                   "max_clusters", "capacity", "chunk",
                                   "direct_transfer"))
def cluster_frames_chunk(ng_xyz, ng_mask, ng_entropy, frame_valid, stats,
                         f0, seed, chunk=8,
                         n_frames_window=2, cap_in=65536, eps=0.15,
                         min_samples=5, min_cluster_size=15,
                         prob_threshold=0.3, ephe_percentile=30.0,
                         ephe_min_score=0.5, max_clusters=256, capacity=4096,
                         direct_transfer=True):
    """Cluster ``chunk`` consecutive frames in one device program.

    All ``chunk`` frame windows cluster in a SINGLE paged density-
    clustering call (`dbscan_labels_paged`): pages are distance- and
    cell-isolated, so results equal the per-frame runs, while the
    propagation while_loop and every banded pass amortize their grid /
    dispatch overhead across the whole chunk instead of paying it per
    frame. Label transfer, compaction, and detection tables then run
    per frame under ``lax.map``.
    """
    from ..ops.cluster import dbscan_labels_paged
    from ..ops.neighbors import knn_labels_paged

    feats, fmask, src_f, src_i = jax.vmap(
        lambda i: select_cluster_input(ng_xyz, ng_mask, ng_entropy,
                                       frame_valid, f0 + i, seed, stats,
                                       n_frames_window, cap_in))(
        jnp.arange(chunk))                      # (chunk, cap_in, 5/None)
    n_ng = ng_xyz.shape[1]
    chunk_xyz = jax.lax.dynamic_slice_in_dim(ng_xyz, f0, chunk, 0)
    chunk_ngm = jax.lax.dynamic_slice_in_dim(ng_mask, f0, chunk, 0)
    chunk_ent = jax.lax.dynamic_slice_in_dim(ng_entropy, f0, chunk, 0)
    if cap_in >= 16384:
        # big pages: ONE paged clustering call + ONE paged label-transfer
        # pass for the whole chunk — every while_loop round, sort, and
        # small op amortizes across the chunk instead of paying the axon
        # per-op dispatch cost per frame. (The former per-frame default's
        # compile blowup was the multi-launch banded scans; the
        # single-launch kernels fixed it.)
        from ..ops.banded import CELL
        from ..ops.cluster import paged_cell_sort
        flat_feats = feats.reshape(chunk * cap_in, 5)
        flat_mask = fmask.reshape(chunk * cap_in)
        pages = jnp.repeat(jnp.arange(chunk, dtype=jnp.int32), cap_in)
        # per-page cell-grid origin = the frame WINDOW's bounding corner:
        # covers both the selected data (drawn from the window frames)
        # and the frame's full query cloud in the label transfer, so the
        # transfer can reuse the data sort below with a shared grid.
        # Window origins depend only on the window's frames, never on
        # f0/chunk, so chunk splits and mesh shards stay bit-identical.
        f_real = jnp.sum(frame_valid.astype(jnp.int32))
        los = jnp.clip(f0 + jnp.arange(chunk), 0,
                       jnp.maximum(f_real - n_frames_window, 0))

        def window_corner(lo):
            mins = []
            for rel in range(n_frames_window):
                f = jnp.minimum(lo + rel, ng_xyz.shape[0] - 1)
                m = ng_mask[f] & frame_valid[f] & (lo + rel == f)
                mins.append(jnp.min(
                    jnp.where(m[:, None], ng_xyz[f][:, :2], 1e9), axis=0))
            mn = jnp.asarray(mins).min(axis=0)
            return jnp.where(mn >= 1e9, 0.0, mn)

        orig = (jnp.floor(jax.vmap(window_corner)(los) / CELL) - 1.0) * CELL
        # the paged cell sort of the cluster input serves both the dbscan
        # and the transfer's data side — one ~1M argsort, not two
        presorted = paged_cell_sort(flat_feats, flat_mask, pages, chunk,
                                    origins=orig)
        raw_labels, raw_probs = dbscan_labels_paged(
            flat_feats, flat_mask, pages, chunk, eps=eps,
            min_samples=min_samples, min_cluster_size=min_cluster_size,
            presorted=presorted)
        # direct copy for the SELECTED points: a query that IS a data
        # point has itself as nearest neighbor at distance 0, so its
        # transferred label/probability are its own — scatter them back
        # via the selection provenance and exclude those queries from the
        # kNN pass. ~half the cloud is selected per window (moving points
        # nearly always), and masked queries sort to the invalid tail of
        # the banded pass, so the nearest pass really shrinks with it.
        nq = chunk * n_ng
        if direct_transfer:
            page_of_src = (src_f - f0).reshape(-1)       # data page == own frame?
            direct = fmask.reshape(-1) & (
                page_of_src == jnp.repeat(jnp.arange(chunk, dtype=jnp.int32),
                                          cap_in))
            tgt = jnp.where(direct,
                            page_of_src * n_ng + src_i.reshape(-1), nq)
            lab_direct = jnp.full(nq + 1, -1, jnp.int32).at[tgt].set(
                jnp.where(direct, raw_labels, -1))[:nq]
            prob_direct = jnp.zeros(nq + 1, raw_probs.dtype).at[tgt].set(
                jnp.where(direct, raw_probs, 0.0))[:nq]
            covered = jnp.zeros(nq + 1, bool).at[tgt].set(direct)[:nq]
        else:  # reference formulation: every point goes through the kNN
            lab_direct = prob_direct = None
            covered = jnp.zeros(nq, bool)

        # kNN label transfer on xyz only, squared-distance cutoff 0.2
        # (pointcloud_utils.py:496-513 via knn over [..., :3]) for the
        # unselected remainder
        q_pages = jnp.repeat(jnp.arange(chunk, dtype=jnp.int32), n_ng)
        q_mask = chunk_ngm.reshape(nq) & ~covered
        labels_k, probs_k = knn_labels_paged(
            chunk_xyz.reshape(nq, 3), q_mask, q_pages,
            flat_feats[:, :3], flat_mask, pages, chunk,
            raw_labels, raw_probs, dist_threshold=0.2,
            d_presorted=presorted, origins=orig)
        if direct_transfer:
            labels_k = jnp.where(covered, lab_direct, labels_k)
            probs_k = jnp.where(covered, prob_direct, probs_k)
        labels = labels_k.reshape(chunk, n_ng)
        probs = probs_k.reshape(chunk, n_ng)
    else:
        # small pages (CPU tests, smoke runs): per-frame clustering — the
        # paged band would overflow into the O((chunk*cap)^2) fallback
        raw_labels, raw_probs = jax.lax.map(
            lambda i: dbscan_labels(feats[i], fmask[i], eps=eps,
                                    min_samples=min_samples,
                                    min_cluster_size=min_cluster_size),
            jnp.arange(chunk))
        # lax.map (not vmap): knn_labels' overflow cond must stay lazy —
        # vmap would execute the brute-force fallback branch per frame
        labels, probs = jax.lax.map(
            lambda i: knn_labels(chunk_xyz[i], chunk_ngm[i],
                                 feats[i][:, :3], fmask[i],
                                 raw_labels[i], raw_probs[i],
                                 dist_threshold=0.2), jnp.arange(chunk))

    def post(i):
        # probability < threshold -> noise (lidar_frame.py:163-165)
        lab_raw = jnp.where(probs[i] < prob_threshold, -1, labels[i])
        n_pts = lab_raw.shape[0]
        valid0 = chunk_ngm[i] & (lab_raw >= 0)
        big = jnp.int32(2 ** 30)
        key_raw = jnp.where(valid0, lab_raw, big)
        # ONE stable argsort serves label compaction, the gather table,
        # and the by-label run offsets (this block previously paid ~10
        # large sorts per page: compact_labels_any's sort, the table's
        # argsort, and a fresh key sort inside every by-label statistic)
        order = jnp.argsort(key_raw, stable=True).astype(jnp.int32)
        key_s = key_raw[order]
        is_first = jnp.concatenate([
            key_s[:1] < big, (key_s[1:] != key_s[:-1]) & (key_s[1:] < big)])
        ranks = (jnp.cumsum(is_first) - 1).astype(jnp.int32)
        kept = (key_s < big) & (ranks < max_clusters)
        comp_s = jnp.where(kept, ranks, -1)
        # compact ids follow ascending raw root, exactly like
        # compact_labels_any (np.sort(unique) order, lidar_frame.py:167);
        # clusters past max_clusters and noise stay -1
        lab = jnp.full(n_pts, -1, jnp.int32).at[order].set(comp_s)
        # gather table straight from the same sort: rank within run
        # (overflow-cluster points sort after all kept runs, so kept runs
        # stay contiguous — identical to build_cluster_table's own sort)
        search_key = jnp.where(kept, ranks, max_clusters)
        starts = jnp.searchsorted(search_key,
                                  jnp.arange(max_clusters)).astype(jnp.int32)
        ends = jnp.searchsorted(search_key, jnp.arange(max_clusters),
                                side="right").astype(jnp.int32)
        cnt = ends - starts
        pos = (jnp.arange(n_pts, dtype=jnp.int32)
               - starts[jnp.minimum(search_key, max_clusters - 1)])
        in_table = kept & (pos < capacity)
        flat = jnp.where(in_table, search_key * capacity + pos,
                         max_clusters * capacity)
        table = (jnp.full(max_clusters * capacity + 1, -1, jnp.int32)
                 .at[flat].set(jnp.where(in_table, order, -1))
                 [: max_clusters * capacity].reshape(max_clusters, capacity))
        # statistics straight from the flat cloud (by-label sorted runs):
        # no (C, P, F) gather materialization — those 25M-element tables
        # were the chunk program's dominant HBM traffic — and exact over
        # ALL of a cluster's points where the table truncates at capacity
        valid = chunk_ngm[i] & (lab >= 0)
        det_n = cnt  # exact full counts (len(cluster.points), objects.py:83)
        det_center = seg_ops.seg_median_by_label(chunk_xyz[i], lab, valid,
                                                 max_clusters,
                                                 runs=(starts, cnt))
        # static flag via entropy-score filter (lidar_frame.py:238-243)
        p = seg_ops.seg_percentile_by_label(chunk_ent[i], lab, valid,
                                            max_clusters, ephe_percentile,
                                            runs=(starts, cnt))
        det_static = p > ephe_min_score  # static (cluster_utils.py:62-64)
        return lab, probs[i], det_n, det_center, det_static, table

    return jax.vmap(post)(jnp.arange(chunk))


def spatial_clustering(state: SequenceState, cfg, n_frames: int = 2,
                       force: bool = False, **_):
    """Spatio-temporal density clustering + detection-table generation,
    chunked into multi-frame device programs over resident buffers."""
    if state.done.get("spatial_clustering") and not force:
        return
    caps = state.caps
    f_total = state.n_frames
    pre = cfg.get("preprocessor", {})
    model = pre.get("clustering", {}).get("model", {})
    ent_f = pre.get("clustering", {}).get("entropy_score_filter", {})
    cap_in = cfg.get("capacity", {}).get("max_cluster_input", 65536)

    f_pad = frame_bucket(f_total)
    n_ng = state.ng_bucket()
    frame_valid = np.zeros(f_pad, bool)
    frame_valid[:f_total] = True
    fv = jnp.asarray(frame_valid)
    dev_args = (state.device("ng_xyz", f_pad, n_ng),
                state.device("ng_mask", f_pad, n_ng),
                state.device("ng_entropy", f_pad, n_ng), fv)
    seed = cfg.get("random_seed", 666)

    # per-frame selection stats once per frame, one program for all
    # frames. The cluster input holds ~1/n_frames of each window frame,
    # so its size is bounded by one frame's occupancy bucket — a STABLE
    # (occupancy-bucketed, not data-adaptive) cap keeps compiles shared
    # across sequences while halving the quadratic clustering cost.
    stats = frame_select_stats_all(*dev_args)
    cap_in = min(cap_in, max(4096, -(-n_ng // 2048) * 2048))

    # Whole-sequence program: all frame windows are pages of one paged
    # clustering + label-transfer call, so every dbscan propagation
    # round, sort, and small op amortizes across the sequence (3 chunk
    # launches of 8 pages measured slower than 1 of 24 purely from
    # per-launch dispatch + per-launch while_loop rounds). Waymo-length
    # sequences cap at 32 pages per launch — beyond that the flattened
    # sort/scan buffers (~pages * cap_in * 8 rows) start crowding HBM.
    chunk = min(f_pad, 32)
    kernel_kw = dict(
        n_frames_window=n_frames, cap_in=cap_in,
        eps=model.get("cluster_selection_epsilon", 0.15),
        min_samples=model.get("min_samples", 5),
        min_cluster_size=model.get("min_cluster_size", 15),
        prob_threshold=pre.get("clustering", {}).get("propability_threshold", 0.3),
        ephe_percentile=float(ent_f.get("percentile", 30)),
        ephe_min_score=ent_f.get("min_percentile_pp_score", 0.5),
        max_clusters=caps.max_clusters, capacity=caps.max_cluster_points)

    # multi-chip: pages are distance- and cell-isolated, so the chunk's
    # frame/page axis shards over the mesh (VERDICT r3 #3) — each device
    # runs one smaller paged launch on chunk/D frames, bit-identical to
    # the single-device chunk (tests/test_parallel.py pins it). Local
    # devices only: sequences are per-host under multi-host runs.
    import jax as _jax
    n_dev = _jax.local_device_count()
    use_mesh = (n_dev > 1 and chunk % n_dev == 0
                and cfg.get("parallel", {}).get("shard_cluster", True))
    if use_mesh:
        from ..parallel import make_mesh, sharded_cluster_chunk
        mesh = make_mesh(n_dev)

        def run_chunk(f0):
            out = sharded_cluster_chunk(mesh, cluster_frames_chunk,
                                        dev_args, stats, f0, seed,
                                        chunk=chunk, **kernel_kw)
            # downstream single-device programs mix these with device-0
            # residents (mixed placements reject at dispatch)
            return [_jax.device_put(a, _jax.devices()[0]) for a in out]
    else:
        def run_chunk(f0):
            return cluster_frames_chunk(*dev_args, stats, f0, seed,
                                        chunk=chunk, **kernel_kw)

    starts = list(range(0, f_pad - chunk + 1, chunk))
    if starts[-1] + chunk < f_pad:
        # full-size final chunk anchored at the bucket end: the overlap
        # recomputes a few frames (pages are independent, so results are
        # identical) instead of compiling a second chunk size
        starts.append(f_pad - chunk)
    outs, prev_end = [], 0
    for f0 in starts:
        o = run_chunk(f0)
        if len(starts) > 1:
            # serialize chunk launches with a 1-element sync: enqueueing
            # many back-to-back paged launches (each holding flattened
            # sort buffers + its output tables live) repeatedly crashed
            # the hosted-TPU worker at 200-frame full caps; the sync
            # bounds the in-flight set to one launch for ~30 ms of
            # tunnel round trip each (r5 soak bisection)
            np.asarray(o[0][:1, :1])
        outs.append([a[prev_end - f0:] for a in o])
        prev_end = f0 + chunk
    stacked = [jnp.concatenate([o[i] for o in outs]) for i in range(6)]
    labels_d, probs_d = stacked[0], stacked[1]
    state.put_device("labels", labels_d, f_pad, n_ng)
    state.put_device("probs", probs_d, f_pad, n_ng)
    # the per-frame cluster gather tables were already built inside the
    # chunk programs — install them as the shared det_tables (saves the
    # 24-argsort rebuild program classification/boxes would otherwise run)
    tables_d = stacked[5]
    state._dev[("det_tables", f_pad, n_ng)] = (tables_d, tables_d >= 0)
    # only the small per-detection tables cross the tunnel — packed into
    # ONE download (each host sync pays a ~30 ms tunnel round trip)
    det = np.asarray(_pack_det_jit(stacked[2], stacked[3], stacked[4]))[:f_total]
    state.det_n[...] = det[..., 0].astype(np.int32)
    state.det_center[...] = det[..., 1:4]
    state.det_static[...] = det[..., 4] > 0.5
    state.det_valid[...] = state.det_n > 0
    state.done["spatial_clustering"] = True


@jax.jit
def _pack_metrics_jit(m):
    """Flatten the per-frame filter metrics dict to (F, 4 + 8C) f32."""
    parts = [m["plane"], m["height"],
             m["size"].reshape(m["size"].shape[0], -1),
             m["dmin"], m["dmax"], m["hull_area"], m["ephe_p"]]
    return jnp.concatenate([p.reshape(p.shape[0], -1).astype(jnp.float32)
                            for p in parts], axis=1)


@jax.jit
def _pack_det_jit(det_n, det_center, det_static):
    return jnp.concatenate(
        [det_n[..., None].astype(jnp.float32), det_center,
         det_static[..., None].astype(jnp.float32)], axis=-1)


# ---------------------------------------------------------------------------
# Stage 4: filter_detections  (zero_shot_detector.py:261-297)
# ---------------------------------------------------------------------------

def _filter_metrics_frame(pts_raw, pts_mask, gnd_mask, t, xyz, ent, lab,
                          nmask, fnr, seed, ephe_percentile, ransac_iters,
                          max_clusters):
    """Per-detection filter metrics for ONE frame (frame-local slices +
    the frame's GLOBAL index for the RANSAC key): RANSAC ground plane
    (lidar_frame.py:97-109) plus per-cluster z extent, bbox spans, signed
    plane distances, hull area and entropy percentile — all by-label
    straight from the flat cloud (no (C, P, F) gather tables; exact past
    table capacity). Taking slices (not whole-sequence buffers + fnr)
    lets the frame axis map locally AND shard over a mesh with identical
    per-frame math."""
    base_key = jax.random.PRNGKey(seed)
    pts_ref = pts_raw[:, :3] @ t[:3, :3].T + t[:3, 3]
    gmask = gnd_mask & pts_mask
    gmask = jnp.where(jnp.sum(gmask) >= 3, gmask, pts_mask)
    plane = fit_ground_plane(pts_ref, gmask,
                             jax.random.fold_in(base_key, fnr),
                             iters=ransac_iters)
    valid = nmask & (lab >= 0)
    pmin = seg_ops.seg_min_by_label(xyz, lab, valid, max_clusters)
    pmax = seg_ops.seg_max_by_label(xyz, lab, valid, max_clusters)
    d = (xyz @ plane[:3] + plane[3]) / jnp.linalg.norm(plane[:3])
    dmin = seg_ops.seg_min_by_label(d, lab, valid, max_clusters, fill=1e9)
    dmax = seg_ops.seg_max_by_label(d, lab, valid, max_clusters, fill=-1e9)
    hull_area = seg_ops.hull_area_by_label(xyz[:, :2], lab, valid,
                                           max_clusters)
    ephe_p = seg_ops.seg_percentile_by_label(ent, lab, valid,
                                             max_clusters, ephe_percentile)
    return {"plane": plane, "height": pmax[:, 2] - pmin[:, 2],
            "size": pmax - pmin, "dmin": dmin, "dmax": dmax,
            "hull_area": hull_area, "ephe_p": ephe_p}


@partial(jax.jit, static_argnames=("ransac_iters", "max_clusters"))
def filter_metrics_all(points, points_mask, ground_mask, transforms,
                       ng_xyz, ng_entropy, labels, ng_mask, seed,
                       ephe_percentile, ransac_iters=100, max_clusters=256):
    """Filter metrics for every frame in ONE device program."""
    return jax.lax.map(
        lambda f: _filter_metrics_frame(
            points[f], points_mask[f], ground_mask[f], transforms[f],
            ng_xyz[f], ng_entropy[f], labels[f], ng_mask[f], f, seed,
            ephe_percentile, ransac_iters, max_clusters),
        jnp.arange(points.shape[0]))


def filter_detections(state: SequenceState, cfg, force: bool = False, **_):
    """Apply the configured cluster filters to every detection.

    Combinator semantics match Detection.filter (objects.py:158-181):
    valid = (all(and) or any(or)) and all(and+required). The combinator
    itself stays on host (a handful of (F, C) boolean vectors).
    """
    if state.done.get("filter_detections") and not force:
        return
    pre = cfg.get("preprocessor", {})
    filters = pre.get("clustering", {}).get("filters", [])
    active = pre.get("clustering", {}).get("filters_active", [])
    caps = state.caps
    f_total = state.n_frames
    f_pad = frame_bucket(f_total)

    ephe_percentile = 20.0
    for flt in filters:
        if flt["name"] == "filter_by_ephemeral_score" and flt["name"] in active:
            ephe_percentile = float(flt.get("args", {}).get("percentile", 20))

    n_pts = state.points_bucket()
    n_ng = state.ng_bucket()
    metric_args = (
        state.device("points", f_pad, n_pts),
        state.device("points_mask", f_pad, n_pts),
        state.device("ground_mask", f_pad, n_pts),
        jnp.asarray(_transforms_to_ref(state, f_pad)),
        state.device("ng_xyz", f_pad, n_ng),
        state.device("ng_entropy", f_pad, n_ng),
        state.device("labels", f_pad, n_ng),
        state.device("ng_mask", f_pad, n_ng))
    seed = cfg.get("random_seed", 666)
    iters = cfg.get("capacity", {}).get("ransac_iters", 100)
    # multi-chip: per-frame metrics are fully frame-independent (the
    # RANSAC key folds in the GLOBAL frame index), so the frame axis
    # shards with zero collectives, bit-identical to the single-device
    # program (tests/test_parallel.py pins it)
    import jax as _jax
    n_dev = _jax.local_device_count()
    if (n_dev > 1 and f_pad % n_dev == 0
            and cfg.get("parallel", {}).get("shard_filter", True)):
        from ..parallel import make_mesh, sharded_filter_metrics
        per_frame = sharded_filter_metrics(
            make_mesh(n_dev), *metric_args, seed, ephe_percentile,
            ransac_iters=iters, max_clusters=caps.max_clusters)
        per_frame = {k: _jax.device_put(v, _jax.devices()[0])
                     for k, v in per_frame.items()}
    else:
        per_frame = filter_metrics_all(
            *metric_args, seed, ephe_percentile, ransac_iters=iters,
            max_clusters=caps.max_clusters)
    # pack the 7 metric fields into ONE host download (one tunnel round
    # trip instead of seven)
    packed = np.asarray(_pack_metrics_jit(per_frame))[:f_total]
    C = caps.max_clusters
    metrics = {
        "plane": packed[:, :4],
        "height": packed[:, 4:4 + C],
        "size": packed[:, 4 + C:4 + 4 * C].reshape(f_total, C, 3),
        "dmin": packed[:, 4 + 4 * C:4 + 5 * C],
        "dmax": packed[:, 4 + 5 * C:4 + 6 * C],
        "hull_area": packed[:, 4 + 6 * C:4 + 7 * C],
        "ephe_p": packed[:, 4 + 7 * C:4 + 8 * C],
    }
    state.plane_ref[...] = metrics["plane"]

    n_pts = state.det_n              # (F, C)
    height = metrics["height"]
    size = metrics["size"]           # (F, C, 3)
    dmin, dmax = metrics["dmin"], metrics["dmax"]
    hull_area = metrics["hull_area"]

    and_v, or_v, req_v = [], [], []
    for flt in filters:
        name = flt["name"]
        if name not in active:
            continue
        args = flt.get("args", {})
        if name == "filter_by_number_points":
            valid = (n_pts >= args.get("min_points", 0)) & (
                n_pts <= args.get("max_points", 999999))
        elif name == "filter_by_height":
            valid = (height >= args["min_height"]) & (height <= args["max_height"])
        elif name == "filter_by_plane_distance":
            # signed directional distance (cluster_utils.py:51-60)
            valid = (dmin <= args["max_min_height"]) & (dmax >= args["min_max_height"])
        elif name == "filter_by_aspect_ratio":
            mx = np.maximum(size[..., 0], size[..., 1])
            mn = np.maximum(np.minimum(size[..., 0], size[..., 1]), 1e-9)
            ar = mx / mn
            valid = (ar <= args["max_aspect_ratio"]) & (
                (ar >= args["min_aspect_ratio"])
                | (size[..., 0] < 1.0) | (size[..., 1] < 1.0))
        elif name in ("filter_by_volume", "filter_by_area"):
            metric = hull_area * height if name == "filter_by_volume" else hull_area
            lo = args.get("min_volume" if name == "filter_by_volume" else "min_area", 0.0)
            valid = (metric >= lo) & (n_pts >= 3)
            hi = args.get("max_volume" if name == "filter_by_volume" else "max_area")
            if hi is not None:
                valid &= metric <= hi
        elif name == "filter_by_ephemeral_score":
            valid = ~(metrics["ephe_p"] > args["min_percentile_pp_score"])  # "moving"
        else:
            # unknown filters are skipped silently, mirroring the
            # getattr(...) guard at zero_shot_detector.py:283
            continue
        if args.get("logic") == "and" and args.get("required", False):
            req_v.append(valid)
        elif args.get("logic") == "and":
            and_v.append(valid)
        elif args.get("logic") == "or":
            or_v.append(valid)
    shape = (f_total, caps.max_clusters)
    all_and = np.all(and_v, axis=0) if and_v else np.ones(shape, bool)
    any_or = np.any(or_v, axis=0) if or_v else np.zeros(shape, bool)
    all_req = np.all(req_v, axis=0) if req_v else np.ones(shape, bool)
    state.det_valid[...] = (all_and | any_or) & all_req & (n_pts > 0)
    state.done["filter_detections"] = True
