"""Capture a jax.profiler device trace of ONE warm bench-scale sequence
and print the aggregate op-time table (no TensorBoard needed).

Usage: python tools/profile_trace.py [--top 40]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    top = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 40
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from bench import build, pregenerate
    from vilgod_tpu.models.clip_wrapper import ClipWrapper
    from vilgod_tpu.pipeline.runner import ZeroShotDetector

    scale = "full" if jax.devices()[0].platform == "tpu" else "small"
    cfg, ds, _ = build(scale)
    clip_model = ClipWrapper(cfg["preprocessor"]["clip"],
                             checkpoint_path=cfg["paths"].get("clip_model"))
    name = ds.sequence_names()[0]
    seq = ds.sequence(name)
    for f in range(seq.sequence_length):
        seq.get_lidar_points(f)

    # warm pass compiles everything
    ZeroShotDetector(seq, name, cfg, clip_model=clip_model).process()

    out = "/tmp/vilgod_trace"
    os.system(f"rm -rf {out}")
    import time
    t0 = time.perf_counter()
    jax.profiler.start_trace(out)
    ZeroShotDetector(seq, name, cfg, clip_model=clip_model).process()
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    print(f"# traced warm sequence: wall={wall:.2f}s "
          f"({wall / seq.sequence_length * 1e3:.1f} ms/frame)")

    files = glob.glob(f"{out}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found under", out)
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    # device-side complete events: aggregate by op name, split host/device
    pid_name = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    dev_total = 0.0
    for e in trace["traceEvents"]:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname and "/device" not in pname:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e6  # us -> s
        agg[name] += dur
        cnt[name] += 1
        dev_total += dur
    print(f"# device busy total (sum of events, incl nesting): "
          f"{dev_total:.2f}s across {sum(cnt.values())} events")
    print(f"{'op':66s} {'total_s':>8s} {'n':>6s}")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{name[:66]:66s} {t:8.3f} {cnt[name]:6d}")


if __name__ == "__main__":
    main()
