"""Reconcile the three contradictory perf instruments (VERDICT r4 weak #1).

Round 4 recorded three numbers that cannot all be true:
  - bench wall: 7.38 s / 48 frames = 154 ms/frame
  - bench VILGOD_SYNC_STAGES breakdown: sums to 665 ms/frame
  - MICROBENCH device stages: ~85 ms/frame

Hypotheses to kill, in order (VERDICT r4 next-round #1):
  H1 recompiles triggered inside the sync pass (each stage's packed
     download concatenates a *different* leaf set -> a fresh XLA program
     per stage whose compile time lands inside that stage's timer)
  H2 tunnel round-trip latency billed to stages (the axon backend is a
     remote TPU behind an RPC tunnel; a blocking download pays a fixed
     round trip regardless of payload size)
  H3 upstream async work forced by the first download (upload flush +
     queued programs attribute to whichever stage downloads first)

This script measures each directly on the chip, then produces the
*honest* instrument: prefix-differenced stage times. Run the pipeline
with pipeline_active[:k] for k = 0..n, wall-clock each prefix (forcing
completion with the same packed download, then measuring the pure
packed-download overhead immediately after when nothing is pending and
subtracting it). stage_k = adj_k - adj_{k-1}; the rows sum to the
adjusted full wall BY CONSTRUCTION, so the breakdown can never again
claim 4.3x the wall it dissects.

Usage: python tools/reconcile_timing.py [--passes 2]
"""
from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def packed_download(state) -> float:
    """The old instrument's sync: one tiny download depending on every
    resident device buffer. Returns elapsed seconds."""
    import jax.numpy as jnp
    t0 = time.perf_counter()
    leaves = []
    for v in state._dev.values():
        for a in (v if isinstance(v, tuple) else (v,)):
            leaves.append(a.ravel()[:1].astype(jnp.float32))
    if leaves:
        np.asarray(jnp.concatenate(leaves))
    return time.perf_counter() - t0


def run_prefix(cfg, ds, clip_model, k: int, active: list[str]):
    """One pipeline pass over the first k stages; returns
    (total_wall, first_sync_cost, second_sync_cost)."""
    from vilgod_tpu.pipeline.runner import ZeroShotDetector
    cfg = cfg.copy()
    cfg["pipeline_active"] = active[:k]
    name = ds.sequence_names()[0]
    t0 = time.perf_counter()
    zsd = ZeroShotDetector(ds.sequence(name), name, cfg,
                           clip_model=clip_model)
    zsd.process()
    s1 = packed_download(zsd.state)   # force everything outstanding
    total = time.perf_counter() - t0
    s2 = packed_download(zsd.state)   # pure overhead: nothing pending now
    return total, s1, s2


def main():
    logging.basicConfig(level=logging.WARNING)
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])

    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from bench import build, pregenerate
    from vilgod_tpu.models.clip_wrapper import ClipWrapper

    platform = jax.devices()[0].platform
    cfg, ds, warm = build("full" if platform == "tpu" else "small")
    # one sequence is enough for attribution
    active = list(cfg["pipeline_active"])
    clip_model = ClipWrapper(cfg["preprocessor"]["clip"],
                             checkpoint_path=cfg["paths"].get("clip_model"))
    pregenerate(ds)

    # ---- warmup: compile everything once ------------------------------
    print(f"# platform={platform} warmup (full pipeline, compiles)...",
          file=sys.stderr)
    t0 = time.perf_counter()
    run_prefix(cfg, ds, clip_model, len(active), active)
    print(f"# warmup done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # ---- H2: tunnel round-trip latency ---------------------------------
    import jax.numpy as jnp
    x = jnp.zeros((8,), jnp.float32) + 1.0
    np.asarray(x)  # compile + first download
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(x)
        rtts.append(time.perf_counter() - t0)
    print(f"# H2 tunnel download RTT (8 floats, warm): "
          f"median={np.median(rtts)*1e3:.1f}ms min={min(rtts)*1e3:.1f}ms "
          f"max={max(rtts)*1e3:.1f}ms", file=sys.stderr)

    # ---- H1+H3: replay the OLD instrument, counting compiles ----------
    records: list[str] = []

    class _H(logging.Handler):
        def emit(self, rec):
            records.append(rec.getMessage()[:120])

    h = _H()
    comp_log = logging.getLogger("jax._src.interpreters.pxla")
    comp_log2 = logging.getLogger("jax._src.dispatch")
    jax.config.update("jax_log_compiles", True)
    for lg in (comp_log, comp_log2):
        lg.addHandler(h)
        lg.setLevel(logging.DEBUG)
    from vilgod_tpu.pipeline.runner import ZeroShotDetector
    name = ds.sequence_names()[0]
    os.environ["VILGOD_SYNC_STAGES"] = "1"
    try:
        n_before = len(records)
        zsd = ZeroShotDetector(ds.sequence(name), name, cfg,
                               clip_model=clip_model)
        zsd.process()
        old_times = dict(zsd.stage_times)
        n_compiles = len(records) - n_before
    finally:
        os.environ.pop("VILGOD_SYNC_STAGES", None)
        jax.config.update("jax_log_compiles", False)
        for lg in (comp_log, comp_log2):
            lg.removeHandler(h)
    n_frames = ds.sequence(name).sequence_length
    print(f"# H1 old sync-pass instrument: sum="
          f"{sum(old_times.values())/n_frames*1e3:.0f}ms/frame, "
          f"compiles_during_pass={n_compiles}", file=sys.stderr)
    for m in records[:30]:
        print(f"#   compile: {m}", file=sys.stderr)
    print("# old per-stage ms/frame: " + " ".join(
        f"{k}={v/n_frames*1e3:.0f}" for k, v in
        sorted(old_times.items(), key=lambda kv: -kv[1])), file=sys.stderr)

    # ---- the honest instrument: prefix differencing --------------------
    prefixes = []
    for k in range(len(active) + 1):
        best = None
        for _ in range(passes):
            tot, s1, s2 = run_prefix(cfg, ds, clip_model, k, active)
            adj = tot - s2  # subtract pure sync overhead
            if best is None or adj < best[0]:
                best = (adj, tot, s1, s2)
        prefixes.append(best)
        stage = active[k - 1] if k else "(setup+upload)"
        print(f"# prefix k={k:2d} {stage:28s} adj={best[0]:7.3f}s "
              f"tot={best[1]:7.3f}s sync1={best[2]*1e3:7.1f}ms "
              f"sync2={best[3]*1e3:7.1f}ms", file=sys.stderr)

    stage_ms = {}
    for k in range(1, len(active) + 1):
        stage_ms[active[k - 1]] = round(
            (prefixes[k][0] - prefixes[k - 1][0]) / n_frames * 1e3, 2)
    setup_ms = round(prefixes[0][0] / n_frames * 1e3, 2)
    total_ms = round(prefixes[-1][0] / n_frames * 1e3, 2)
    print(json.dumps({
        "platform": platform,
        "n_frames": n_frames,
        "rtt_ms_median": round(float(np.median(rtts)) * 1e3, 2),
        "old_instrument_sum_ms_per_frame": round(
            sum(old_times.values()) / n_frames * 1e3, 1),
        "old_instrument_compiles": n_compiles,
        "setup_upload_ms_per_frame": setup_ms,
        "stage_ms_per_frame": stage_ms,
        "sum_check_ms_per_frame": total_ms,
    }))


if __name__ == "__main__":
    main()
