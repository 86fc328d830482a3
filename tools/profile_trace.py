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


def aggregate_jit_programs(trace_dir) -> dict[str, float]:
    """Total device seconds per top-level jit program from a trace dir.

    Device events nest: anonymous while/fusion/conditional rows live
    inside their parent ``jit_*`` envelope (verified by interval
    containment in the r5 analysis), so summing ONLY the jit-named
    envelopes counts each program once.
    """
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    agg: dict[str, float] = defaultdict(float)
    if not files:
        return agg
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    pid_name = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    for e in trace["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_name.get(e.get("pid"), ""):
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name.startswith("jit("):
            # strip the fingerprint suffix: jit_foo(123...) -> foo,
            # jit(dynamic_slice) -> dynamic_slice
            short = (name[4:].split("(")[0].rstrip(")") or name)
            agg[short] += e.get("dur", 0) / 1e6
    return dict(agg)


def capture_program_times(run_fn, out_dir="/tmp/vilgod_budget_trace"):
    """Run ``run_fn`` under a device trace; return {program: seconds}."""
    import jax
    os.system(f"rm -rf {out_dir}")
    jax.profiler.start_trace(out_dir)
    try:
        run_fn()
    finally:
        jax.profiler.stop_trace()
    return aggregate_jit_programs(out_dir)


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
