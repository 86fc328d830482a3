"""Kernel-level microbenchmark for the pipeline's hot stages.

Runs the bench-scale pipeline up to each stage boundary to obtain REAL
inputs (occupancies and spatial structure drive the banded kernels'
cost), then times the stage internals separately so optimization targets
the measured component, not the guess:

- ground: presort (batched 3-key sort) vs the state-threaded scan;
- clustering: input selection, the paged dbscan's count3 / propagation /
  nearest passes (with the realized propagation round count), the kNN
  label transfer;
- classification: depth rendering vs the ViT encode.

Usage: python tools/microbench.py [ground] [cluster] [classify] [entropy]
(no args = all). Timings are medians of --reps passes (default 3).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(*arrays):
    """Force completion on the tunneled axon runtime: block_until_ready
    does not wait for execution there, only a host download does."""
    import jax.numpy as jnp
    return np.asarray(jnp.concatenate(
        [jnp.ravel(a)[:1].astype(jnp.float32) for a in arrays]))


def timed(label, fn, reps=3):
    # one untimed call for compile
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"  {label:44s} {np.median(ts)*1e3:8.1f} ms")
    return float(np.median(ts))


def build_state():
    from bench import build, pregenerate
    from vilgod_tpu.pipeline.runner import ZeroShotDetector
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache

    import jax
    enable_compilation_cache()
    platform = jax.devices()[0].platform
    scale = "full" if platform == "tpu" else "small"
    cfg, ds, _ = build(scale)
    name = ds.sequence_names()[0]
    seq = ds.sequence(name)
    pregenerate(type("D", (), {"sequence_names": lambda self=None: [name],
                               "sequence": lambda self, n=None, s=seq: s})())
    zsd = ZeroShotDetector(seq, name, cfg)
    return zsd.state, cfg, scale


def bench_ground(state, cfg, reps):
    import jax
    import jax.numpy as jnp
    from vilgod_tpu.ground.patchwork import (ground_config_from_cfg,
                                             init_ground_state,
                                             _presort_frame,
                                             _segment_presorted)
    from vilgod_tpu.pipeline.stages_geometry import frame_bucket

    print("== ground ==")
    gcfg = ground_config_from_cfg(cfg, min_range=1.5)
    f_pad = frame_bucket(state.n_frames)
    n_pts = state.points_bucket()
    pts = state.device("points", f_pad, n_pts)
    msk = state.device("points_mask", f_pad, n_pts)
    pts = pts.at[:, :, 2].add(-1.723)

    presort = jax.jit(lambda p, m: jax.vmap(
        lambda pp, mm: _presort_frame(pp, mm, gcfg))(p, m))

    def scan_only(p, m, pre):
        def step(s, inp):
            ppts, mm, pr = inp
            g, s, _ = _segment_presorted(ppts, mm, s, gcfg, *pr)
            return s, g
        st = init_ground_state(gcfg)
        _, ground = jax.lax.scan(step, st, (p, m, pre))
        return ground

    scan_jit = jax.jit(scan_only)
    pre = presort(pts, msk)
    _sync(pre[0])

    timed("presort (batched 3-key sort, all frames)",
          lambda: _sync(presort(pts, msk)[0]), reps)
    timed("state scan (given presort)",
          lambda: _sync(scan_jit(pts, msk, pre)), reps)


def bench_entropy(state, cfg, reps):
    import jax.numpy as jnp
    from vilgod_tpu.ops.entropy import entropy_sequence
    from vilgod_tpu.pipeline.stages_geometry import frame_bucket

    print("== entropy ==")
    f_pad = frame_bucket(state.n_frames)
    n_ng = state.ng_bucket()
    fv = np.zeros(f_pad, bool)
    fv[:state.n_frames] = True
    args = (state.device("ng_xyz", f_pad, n_ng),
            state.device("ng_mask", f_pad, n_ng), jnp.asarray(fv))
    timed("entropy_sequence (whole sequence)",
          lambda: _sync(entropy_sequence(*args, window=min(15, state.n_frames),
                                         skip_frames=1, radius=0.3,
                                         max_neighbor_points=1000)), reps)


def _cluster_inputs(state, cfg):
    import jax
    import jax.numpy as jnp
    from vilgod_tpu.pipeline.stages_geometry import (frame_bucket,
                                                     frame_select_stats_all,
                                                     select_cluster_input)

    pre = cfg.get("preprocessor", {})
    cap_in = cfg.get("capacity", {}).get("max_cluster_input", 65536)
    f_pad = frame_bucket(state.n_frames)
    n_ng = state.ng_bucket()
    fv = np.zeros(f_pad, bool)
    fv[:state.n_frames] = True
    dev_args = (state.device("ng_xyz", f_pad, n_ng),
                state.device("ng_mask", f_pad, n_ng),
                state.device("ng_entropy", f_pad, n_ng), jnp.asarray(fv))
    stats = frame_select_stats_all(*dev_args)
    cap_in = min(cap_in, max(4096, -(-n_ng // 2048) * 2048))
    chunk = min(f_pad, 32)
    sel = jax.jit(lambda: jax.vmap(
        lambda i: select_cluster_input(*dev_args, i, 666, stats, 2, cap_in))(
        jnp.arange(chunk)))
    feats, fmask, _, _ = sel()
    return dev_args, stats, sel, feats, fmask, cap_in, chunk


def bench_cluster(state, cfg, reps):
    import jax
    import jax.numpy as jnp
    from vilgod_tpu.ops.cluster import dbscan_labels_paged, _core_radii
    from vilgod_tpu.ops import cluster as cl
    from vilgod_tpu.ops.neighbors import knn_labels_paged

    print("== clustering ==")
    dev_args, stats, sel, feats, fmask, cap_in, chunk = _cluster_inputs(state, cfg)
    occ = np.asarray(jnp.sum(fmask, axis=1))
    print(f"  pages={chunk} cap_in={cap_in} real pts/page: "
          f"min={occ.min()} med={int(np.median(occ))} max={occ.max()}")

    from vilgod_tpu.pipeline.stages_geometry import frame_select_stats_all
    timed("frame_select_stats_all",
          lambda: _sync(frame_select_stats_all(*dev_args)[0]), reps)
    timed("select_cluster_input (all pages)",
          lambda: _sync(sel()[0]), reps)

    flat_feats = feats.reshape(chunk * cap_in, 5)
    flat_mask = fmask.reshape(chunk * cap_in)
    pages = jnp.repeat(jnp.arange(chunk, dtype=jnp.int32), cap_in)

    model = cfg.get("preprocessor", {}).get("clustering", {}).get("model", {})
    eps = model.get("cluster_selection_epsilon", 0.15)
    min_samples = model.get("min_samples", 5)
    mcs = model.get("min_cluster_size", 15)

    timed("dbscan_labels_paged (full)",
          lambda: _sync(dbscan_labels_paged(
              flat_feats, flat_mask, pages, chunk, eps=eps,
              min_samples=min_samples, min_cluster_size=mcs)[0]), reps)

    # --- pass-level dissection (mirrors dbscan_labels_paged internals) ---
    from vilgod_tpu.ops.banded import (GRID, band_width, banded_min_label,
                                       banded_nearest, banded_radius_count3,
                                       block_windows, cell_ids)
    from vilgod_tpu.ops.pallas_kernels import TD, TQ, TQ_HEAVY, prep_t8

    n = flat_feats.shape[0]
    iso = (pages.astype(flat_feats.dtype) * cl.PAGE_ISO)[:, None]
    pts_iso = jnp.concatenate([flat_feats, iso], axis=1)
    cell = cell_ids(flat_feats[:, :2], flat_mask)
    page_span = GRID * GRID
    cid = jnp.where(flat_mask, pages * page_span + cell, chunk * page_span)
    order = jnp.argsort(cid).astype(jnp.int32)
    cid_sorted = cid[order]
    pts_s, msk_s = pts_iso[order], flat_mask[order]
    per_page = n // chunk
    w_band = max(8192, -(-int(per_page * 0.35) // TD) * TD)
    w_band = min(w_band, -(-n // TD) * TD)
    invalid = chunk * page_span
    tq_l, tq_h = min(TQ, n), min(TQ_HEAVY, n)

    sort_jit = jax.jit(lambda c: jnp.argsort(c).astype(jnp.int32))
    timed("  cell-id argsort", lambda: _sync(sort_jit(cid)), reps)

    starts_l, ends_l, ovf_l = block_windows(cid_sorted, cid_sorted, tq_l,
                                            w_band, invalid_cid=invalid)
    starts_h, ends_h, ovf_h = block_windows(cid_sorted, cid_sorted, tq_h,
                                            w_band, invalid_cid=invalid)
    print(f"  overflow: light={bool(ovf_l)} heavy={bool(ovf_h)} "
          f"w_band={w_band}")

    eps_cap = eps * 2.0
    levels = jnp.asarray([eps, eps * (2.0 ** 0.5), eps_cap], flat_feats.dtype)
    pts_t8 = prep_t8(pts_s, msk_s, 1)

    count3_jit = jax.jit(lambda: banded_radius_count3(
        pts_t8, pts_t8, starts_h, levels * levels, tq_h, w_band, ndim=6,
        ends=ends_h)[:n])
    timed("  count3 pass", lambda: _sync(count3_jit()), reps)

    counts3 = count3_jit()
    radius, core = _core_radii(counts3, msk_s, levels, eps_cap, min_samples,
                               flat_feats.dtype)
    radius2 = radius * radius
    core_pts_t8 = prep_t8(pts_s, core, 1)
    r2_row = jnp.where(core, radius2, 0.0).astype(jnp.float32)
    big = jnp.asarray(n, jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    minlabel_jit = jax.jit(lambda lab: banded_min_label(
        core_pts_t8, r2_row, jnp.where(core, lab, 2**30).astype(jnp.float32),
        starts_h, tq_h, w_band, 6, 2**30, ends=ends_h)[:n])
    lab0 = jnp.where(core, idx, big)
    timed("  min-label pass (one round)",
          lambda: _sync(minlabel_jit(lab0)), reps)

    # realized propagation rounds (host loop replica of _propagate)
    def radius_min(labels):
        best = jnp.minimum(minlabel_jit(labels).astype(jnp.int32), big)
        return jnp.where(core, jnp.minimum(labels, best), big)

    hook_jit = jax.jit(lambda labels, nbr_min: jnp.where(core, jnp.minimum(
        nbr_min, jnp.full(n + 1, big, jnp.int32).at[
            jnp.where(labels < big, labels, n)].min(nbr_min)[
            jnp.minimum(jnp.where(labels < big, labels, n), n - 1)]), big))
    jump_jit = jax.jit(lambda labels: jnp.where(
        labels < big, jnp.minimum(labels, labels[jnp.where(labels < big,
                                                           labels, 0)]), big))
    labels = jump_jit(radius_min(lab0))
    rounds = 0
    t0 = time.perf_counter()
    while True:
        new = jump_jit(hook_jit(labels, radius_min(labels)))
        rounds += 1
        if not bool(jnp.any(new != labels)):
            break
        labels = new
        if rounds > 64:
            break
    print(f"  propagation rounds to convergence: {rounds} "
          f"({(time.perf_counter()-t0)*1e3:.0f} ms incl. per-round sync)")

    nearest_jit = jax.jit(lambda: banded_nearest(
        prep_t8(pts_s, msk_s, 1), core_pts_t8, starts_l, tq_l, w_band,
        ndim=6, ends=ends_l)[0][:n])
    timed("  nearest pass (border attach)",
          lambda: _sync(nearest_jit()), reps)

    # label transfer
    n_ng = dev_args[0].shape[1]
    chunk_xyz = dev_args[0][:chunk]
    chunk_ngm = dev_args[1][:chunk]
    q_pages = jnp.repeat(jnp.arange(chunk, dtype=jnp.int32), n_ng)
    raw_labels, raw_probs = dbscan_labels_paged(
        flat_feats, flat_mask, pages, chunk, eps=eps,
        min_samples=min_samples, min_cluster_size=mcs)
    timed("knn_labels_paged (label transfer)",
          lambda: _sync(knn_labels_paged(
              chunk_xyz.reshape(chunk * n_ng, 3),
              chunk_ngm.reshape(chunk * n_ng), q_pages,
              flat_feats[:, :3], flat_mask, pages, chunk,
              raw_labels, raw_probs, dist_threshold=0.2)[0]), reps)


def bench_classify(state, cfg, reps):
    import jax
    import jax.numpy as jnp
    from vilgod_tpu.models.clip import (CLIPModel, clip_vit_b16,
                                        init_clip_params, normalize_images)
    from vilgod_tpu.ops.rasterize import render_cluster_views

    print("== classification ==")
    batch = state.caps.clip_batch
    cap = state.caps.max_cluster_points
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(scale=2.0, size=(batch, cap, 3)).astype(np.float32))
    msk = jnp.asarray(rng.uniform(size=(batch, cap)) < 0.5)
    msk = msk.at[:, 0].set(True)

    render = jax.jit(lambda p, m: render_cluster_views(p, m))
    timed(f"render_cluster_views (B={batch}, P={cap})",
          lambda: _sync(render(pts, msk)), reps)

    mcfg = clip_vit_b16(dtype=jnp.bfloat16)
    model = CLIPModel(mcfg)
    params = init_clip_params(mcfg, seed=0)
    imgs = jnp.asarray(rng.uniform(size=(batch * 4, 224, 224, 3)).astype(np.float32))

    encode = jax.jit(lambda p, x: model.apply(
        {"params": p}, normalize_images(x).astype(jnp.bfloat16),
        method=model.encode_image))
    timed(f"ViT-B/16 encode (B={batch * 4})",
          lambda: _sync(encode(params, imgs)), reps)


def main():
    reps = 3
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = set(args) or {"ground", "entropy", "cluster", "classify"}
    state, cfg, scale = build_state()
    print(f"platform scale={scale}")
    # stages provide inputs for later ones
    from vilgod_tpu.pipeline.stages_geometry import (mask_ground_points,
                                                     calculate_entropy_scores)
    mask_ground_points(state, cfg)
    calculate_entropy_scores(state, cfg)
    from vilgod_tpu.pipeline.stages_geometry import frame_bucket
    _sync(state.device("ng_entropy", frame_bucket(state.n_frames),
                       state.ng_bucket()))
    if "ground" in which:
        bench_ground(state, cfg, reps)
    if "entropy" in which:
        bench_entropy(state, cfg, reps)
    if "cluster" in which:
        bench_cluster(state, cfg, reps)
    if "classify" in which:
        bench_classify(state, cfg, reps)


if __name__ == "__main__":
    main()
