"""Waymo-length soak at FULL capacity buckets on the real chip.

VERDICT r3 #8 / SURVEY §7 hard part #4: the ragged-capacity design
(shape buckets, fixed caps) is only proven once a ~200-frame sequence —
the real Waymo length, `/root/reference/src/datasets/waymo_dataset.py`
sequences are ~199 frames — runs at the bench's full capacity buckets on
the production device with (a) no capacity saturation, (b) detections
along the whole sequence, and (c) zero steady-state recompiles of the
whole-sequence programs on a second same-bucket sequence.

Run on the TPU:  python tools/soak_tpu.py          (writes SOAK.md)
CPU smoke:       JAX_PLATFORMS=cpu python tools/soak_tpu.py --smoke
"""
from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEAVY_PROGRAMS = ("_ground_compact", "_compact_sequence", "entropy_sequence",
                  "frame_select_stats", "cluster_frames_chunk",
                  "filter_metrics", "_build_tables", "segment")


def build_cfg(smoke: bool):
    from vilgod_tpu.config.presets import waymo_config
    if smoke:
        cap = {"max_points": 16384, "max_ng_points": 8192, "max_clusters": 64,
               "max_cluster_points": 2048, "max_tracks": 512,
               "max_cluster_input": 8192, "clip_batch": 8}
    else:  # the bench's full-scale buckets (bench.py build())
        cap = {"max_points": 196608, "max_ng_points": 131072,
               "max_clusters": 256, "max_cluster_points": 4096,
               "max_tracks": 1024, "max_cluster_input": 65536,
               "clip_batch": 512}
    stages = ["mask_ground_points", "calculate_entropy_scores",
              "spatial_clustering", "filter_detections", "track_clusters",
              "fit_bounding_boxes_simple", "propagate_labels",
              "evaluate_sequence"]
    return waymo_config(capacity=cap, pipeline_active=stages)


def run_sequence(cfg, seed: int, n_frames: int, smoke: bool,
                 stage_times=None):
    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.pipeline import ZeroShotDetector

    scene = (dict(n_ground=2500, n_vehicles=2, n_pedestrians=1, n_moving=1,
                  area=50.0) if smoke else
             dict(n_ground=120000, n_vehicles=12, n_pedestrians=6,
                  n_cyclists=4, n_moving=6, area=90.0))
    ds = SyntheticDataset(n_sequences=1, n_frames=n_frames, seed=seed,
                          **scene)
    seq = ds.sequence("synth_0")
    for f in range(n_frames):        # host scene generation is not the soak
        seq.get_lidar_points(f)
    zsd = ZeroShotDetector(seq, "synth_0", cfg)
    t0 = time.perf_counter()
    results = zsd.process()
    wall = time.perf_counter() - t0
    if stage_times is not None:
        stage_times.update(zsd.stage_times)
    return zsd.state, results, wall


def main():
    # stage-level progress (runner logs INFO per stage) — a 200-frame
    # full-caps crash must say WHICH stage/launch died
    logging.basicConfig(level=logging.INFO)
    smoke = "--smoke" in sys.argv
    n_frames = 40 if smoke else 200
    import jax
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    platform = jax.devices()[0].platform
    cfg = build_cfg(smoke)

    print(f"# soak: platform={platform} frames={n_frames} "
          f"caps={'smoke' if smoke else 'full'}", file=sys.stderr)
    # capture XLA compile times during the cold pass so the compile
    # budget reports separately from the steady state (VERDICT r4 #2)
    compile_recs: list[str] = []

    class CompileCapture(logging.Handler):
        def emit(self, record):
            compile_recs.append(record.getMessage())

    ch = CompileCapture(level=logging.DEBUG)
    logging.getLogger("jax._src.dispatch").addHandler(ch)
    stage_times: dict[str, float] = {}
    try:
        with jax.log_compiles():
            state, results, wall1 = run_sequence(
                cfg, seed=21, n_frames=n_frames, smoke=smoke,
                stage_times=stage_times)
    finally:
        logging.getLogger("jax._src.dispatch").removeHandler(ch)
    import re as _re
    cold_compiles = []
    for m in compile_recs:
        g = _re.match(r"Finished XLA compilation of (\S+) in ([0-9.]+) sec", m)
        if g:
            cold_compiles.append((g.group(1), float(g.group(2))))
    compile_total = sum(t for _, t in cold_compiles)

    # --- capacity + quality-of-life assertions (mirror tests/test_soak) ---
    assert len(results) == n_frames
    assert state.det_n.max() > 0, "no detections at all"
    labels_used = int(state.labels.max()) + 1
    assert labels_used < state.caps.max_clusters, "cluster table saturated"
    n_tracks = len(state.tracks.valid_tracks())
    assert 0 < n_tracks < state.caps.max_tracks, "track pool saturated"
    dets_late = sum(len(results[f]["boxes_lidar"])
                    for f in range(n_frames - 50, n_frames))
    assert dets_late > 0, "no detections in the final 50 frames"

    # --- steady state: second same-bucket sequence, warm programs ---
    records: list[str] = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture(level=logging.WARNING)
    logging.getLogger("jax._src.dispatch").addHandler(h)
    warm_times: dict[str, float] = {}
    try:
        with jax.log_compiles():
            _, results2, wall2 = run_sequence(cfg, seed=22,
                                              n_frames=n_frames, smoke=smoke,
                                              stage_times=warm_times)
    finally:
        logging.getLogger("jax._src.dispatch").removeHandler(h)
    recompiled = [m for m in records
                  if ("Compiling" in m or "Finished XLA compilation" in m)
                  and any(k in m for k in HEAVY_PROGRAMS)]

    fps = n_frames / wall2
    # actual scene occupancy — never a hard-coded claim (VERDICT r4 weak #2)
    raw_pts = state.points_mask.sum(axis=1)
    ng_pts = state._ng_counts
    mode = "smoke" if smoke else "full"
    lines = [
        f"# SOAK — {n_frames}-frame sequence at {mode.upper()} capacity buckets",
        "",
        f"Run: `python tools/soak_tpu.py{' --smoke' if smoke else ''}` on "
        f"**{platform}**, {time.strftime('%Y-%m-%d')}.",
        "",
        f"- sequence length: {n_frames} frames "
        f"(Waymo val sequences are ~199)",
        f"- raw points/frame: mean {raw_pts.mean():,.0f}, "
        f"max {raw_pts.max():,} (bucket {state.points_bucket():,}); "
        f"non-ground mean {ng_pts.mean():,.0f}, max {ng_pts.max():,} "
        f"(bucket {state.ng_bucket():,})",
        f"- capacity buckets: {vars(state.caps)}",
        f"- cold sequence (compiles included): {wall1:.1f} s, of which "
        f"XLA compilation {compile_total:.1f} s across {len(cold_compiles)} "
        f"programs (the persistent cache amortizes this across processes)",
        f"- warm same-bucket sequence: {wall2:.1f} s -> **{fps:.2f} frames/s** "
        f"steady-state at this length",
        f"- clusters used: {labels_used}/{state.caps.max_clusters}; "
        f"tracks: {n_tracks}/{state.caps.max_tracks}; "
        f"detections in final 50 frames: {dets_late}",
        f"- steady-state recompiles of whole-sequence programs: "
        f"**{len(recompiled)}**" + (" — " + recompiled[0][:200]
                                    if recompiled else " (none)"),
        "",
        "Per-stage wall (s; warm stage rows lag the async device queue — "
        "work syncs at the next stage's first download — so read them as "
        "ordering hints; the honest budget is bench.py's device-trace "
        "stage table):",
        "",
        "| stage | cold (incl compiles) | warm |",
        "|---|---|---|",
    ]
    lines += [f"| {k} | {v:.2f} | {warm_times.get(k, 0.0):.2f} |"
              for k, v in sorted(stage_times.items(), key=lambda kv: -kv[1])]
    lines.append("")
    if cold_compiles:
        lines += ["Largest cold compiles (s):", "", "| program | s |", "|---|---|"]
        lines += [f"| {n} | {t:.1f} |" for n, t in
                  sorted(cold_compiles, key=lambda kv: -kv[1])[:10]]
        lines.append("")
    out = Path(__file__).resolve().parent.parent / "SOAK.md"
    out.write_text("\n".join(lines))
    print("\n".join(lines))
    if recompiled:
        print(f"# RECOMPILE AT STEADY STATE: {recompiled[:3]}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
