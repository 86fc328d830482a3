"""Isolate the full-soak clustering crash: build the SOAK's exact state
(ground + entropy on the chip), then dissect chunk 0 of the clustering
stage — window overflow flags first, then the launch itself.

Usage: python tools/debug_soak_cluster.py [--frames 200]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def step(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"  {label:44s} {time.perf_counter() - t0:8.2f} s", flush=True)
    return out


def main():
    frames = 200
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tools.soak_tpu import build_cfg
    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.pipeline import ZeroShotDetector
    from vilgod_tpu.pipeline.stages_geometry import (
        cluster_frames_chunk, frame_bucket, frame_select_stats_all,
        select_cluster_input)

    cfg = build_cfg(False)
    cfg["pipeline_active"] = ["mask_ground_points", "calculate_entropy_scores"]
    scene = dict(n_ground=120000, n_vehicles=12, n_pedestrians=6,
                 n_cyclists=4, n_moving=6, area=90.0)
    ds = SyntheticDataset(n_sequences=1, n_frames=frames, seed=21, **scene)
    seq = ds.sequence("synth_0")
    for f in range(frames):
        seq.get_lidar_points(f)
    zsd = ZeroShotDetector(seq, "synth_0", cfg)
    step("ground+entropy", zsd.process)
    state = zsd.state

    f_pad = frame_bucket(frames)
    n_ng = state.ng_bucket()
    print(f"# f_pad={f_pad} n_ng={n_ng} "
          f"ng_occ_max={int(state._ng_counts.max())}")
    fv = np.zeros(f_pad, bool)
    fv[:frames] = True
    dev_args = (state.device("ng_xyz", f_pad, n_ng),
                state.device("ng_mask", f_pad, n_ng),
                state.device("ng_entropy", f_pad, n_ng), jnp.asarray(fv))
    stats = step("frame_select_stats_all",
                 lambda: jax.block_until_ready(
                     frame_select_stats_all(*dev_args)))

    cap_in = min(65536, max(4096, -(-n_ng // 2048) * 2048))
    chunk = min(f_pad, 32)
    print(f"# cap_in={cap_in} chunk={chunk} flat={chunk * cap_in}")

    from vilgod_tpu.ops.banded import GRID, block_windows
    from vilgod_tpu.ops.cluster import paged_cell_sort
    from vilgod_tpu.ops.pallas_kernels import TD, TQ, TQ_HEAVY

    starts_list = list(range(0, f_pad - chunk + 1, chunk))
    if starts_list[-1] + chunk < f_pad:
        starts_list.append(f_pad - chunk)

    # ---- window overflow dissection for EVERY chunk (the soak crashed
    # mid-loop; chunk 0 alone passed). Includes the CORE-COMPACTED
    # propagation/nearest windows (r5 compaction): compacted blocks span
    # more cells, so they overflow where the all-point windows do not.
    n = chunk * cap_in
    per_page = n // chunk
    w_band = max(8192, -(-int(per_page * 0.35) // TD) * TD)
    w_band = min(w_band, -(-n // TD) * TD)
    invalid = chunk * GRID * GRID

    @jax.jit
    def dissect(f0):
        feats, fmask, _, _ = jax.vmap(lambda i: select_cluster_input(
            *dev_args, f0 + i, 666, stats, 2, cap_in))(jnp.arange(chunk))
        flat_feats = feats.reshape(chunk * cap_in, 5)
        flat_mask = fmask.reshape(chunk * cap_in)
        pages = jnp.repeat(jnp.arange(chunk, dtype=jnp.int32), cap_in)
        order, cid_sorted = paged_cell_sort(flat_feats, flat_mask, pages,
                                            chunk)
        pts_s, msk_s = flat_feats[order], flat_mask[order]
        # replicate _dbscan_banded's core computation (count3 pass)
        from vilgod_tpu.ops.banded import banded_radius_count3
        from vilgod_tpu.ops.cluster import _core_radii
        from vilgod_tpu.ops.pallas_kernels import prep_t8
        eps, eps_cap_factor, min_samples = 0.15, 2.0, 5
        eps_cap = eps * eps_cap_factor
        levels = jnp.asarray(
            [eps, eps * (eps_cap_factor ** 0.5), eps_cap], jnp.float32)
        tq_h = min(TQ_HEAVY, n)
        s_h, e_h, ovf_h = block_windows(cid_sorted, cid_sorted, tq_h,
                                        w_band, invalid_cid=invalid)
        pts_t8 = prep_t8(pts_s, msk_s, 1)
        counts3 = banded_radius_count3(pts_t8, pts_t8, s_h, levels * levels,
                                       tq_h, w_band, ndim=5, ends=e_h)[:n]
        radius, core = _core_radii(counts3, msk_s, levels, eps_cap,
                                   min_samples, jnp.float32)
        core_pos = jnp.cumsum(core.astype(jnp.int32)) - 1
        core_src = jnp.full(n + 1, n, jnp.int32).at[
            jnp.where(core, core_pos, n)].set(
            jnp.arange(n, dtype=jnp.int32))[:n]
        valid_c = core_src < n
        cid_c = jnp.where(valid_c, cid_sorted[jnp.minimum(core_src, n - 1)],
                          invalid)
        tq_l = min(TQ, n)
        out = {}
        for key, (cq, cd, tq) in {
            "all_TQ": (cid_sorted, cid_sorted, tq_l),
            "all_TQH": (cid_sorted, cid_sorted, tq_h),
            "core_prop": (cid_c, cid_c, tq_h),
            "core_nearest": (cid_sorted, cid_c, tq_l),
        }.items():
            st, en, ovf = block_windows(cq, cd, tq, w_band,
                                        invalid_cid=invalid)
            out[key] = (jnp.max(en - st), ovf)
        return fmask.sum(1), jnp.sum(core), out

    for f0 in starts_list:
        sel, ncore, out = jax.block_until_ready(dissect(f0))
        msg = " ".join(f"{k}: span={int(v[0])} ovf={bool(v[1])}"
                       for k, v in out.items())
        print(f"# f0={f0:3d} sel_mean={np.asarray(sel).mean():7.0f} "
              f"core={int(ncore)} {msg}", flush=True)

    if "--launch" in sys.argv:
        kw = dict(n_frames_window=2, cap_in=cap_in, eps=0.15, min_samples=5,
                  min_cluster_size=15, prob_threshold=0.3,
                  ephe_percentile=30.0, ephe_min_score=0.5, max_clusters=256,
                  capacity=4096)
        for f0 in starts_list:
            o = step(f"cluster_frames_chunk f0={f0}",
                     lambda f0=f0: cluster_frames_chunk(
                         *dev_args, stats, f0, 666, chunk=chunk, **kw))
            step("  sync", lambda: np.asarray(o[0][:1, :1]))
        print("# OK")


if __name__ == "__main__":
    main()
