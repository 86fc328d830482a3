"""Bisect the full-caps spatial_clustering TPU worker crash (r5).

The 200-frame full-caps soak kills the TPU worker inside the first
spatial_clustering download (both with and without the r5 core
compaction). Bench's 24-frame sequences (chunk=24 pages) never crash.
Suspects: chunk=32 page launches, the f_pad=200/64 stats program, this
scene's ng occupancy bucket, or a pallas banded kernel at these shapes.

Usage:
  python tools/debug_cluster_crash.py [--frames 64] [--no-pallas]
"""
import logging
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--no-pallas" in sys.argv:
    os.environ["VILGOD_NO_PALLAS"] = "1"

import numpy as np  # noqa: E402


def main():
    logging.basicConfig(level=logging.INFO)
    frames = 64
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    print(f"# platform={jax.devices()[0].platform} frames={frames} "
          f"pallas={'off' if os.environ.get('VILGOD_NO_PALLAS') else 'on'}",
          file=sys.stderr)

    from vilgod_tpu.config.presets import waymo_config
    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.pipeline import ZeroShotDetector

    cap = {"max_points": 196608, "max_ng_points": 131072,
           "max_clusters": 256, "max_cluster_points": 4096,
           "max_tracks": 1024, "max_cluster_input": 65536,
           "clip_batch": 128}
    cfg = waymo_config(capacity=cap, pipeline_active=[
        "mask_ground_points", "calculate_entropy_scores",
        "spatial_clustering"])
    ds = SyntheticDataset(n_sequences=1, n_frames=frames, seed=21,
                          n_ground=120000, n_vehicles=12, n_pedestrians=6,
                          n_cyclists=4, n_moving=6, area=90.0)
    seq = ds.sequence("synth_0")
    for f in range(frames):
        seq.get_lidar_points(f)
    t0 = time.perf_counter()
    zsd = ZeroShotDetector(seq, "synth_0", cfg)
    zsd.process()
    st = zsd.state
    print(f"# OK in {time.perf_counter() - t0:.1f}s: "
          f"ng_bucket={st.ng_bucket()} dets={int(st.det_valid.sum())} "
          f"labels_max={int(st.labels.max())}")


if __name__ == "__main__":
    main()
