"""Per-stage wall-clock budget on the real device (debugging aid).

Runs the full bench-scale pipeline over ONE sequence with
``VILGOD_SYNC_STAGES=1`` so async device work is attributed to the stage
that enqueued it, and prints the per-stage budget. A second (warm)
sequence separates compile time from steady-state.
"""
import logging
import os
import sys
import time

os.environ.setdefault("VILGOD_SYNC_STAGES", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(message)s")


def main():
    from bench import build, pregenerate
    from vilgod_tpu.models.clip_wrapper import ClipWrapper
    from vilgod_tpu.pipeline.runner import ZeroShotDetector
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    platform = jax.devices()[0].platform
    scale = "full" if platform == "tpu" else "small"
    cfg, ds, warm = build(scale)
    clip_model = ClipWrapper(cfg["preprocessor"]["clip"],
                             checkpoint_path=cfg["paths"].get("clip_model"))
    budgets = []
    seqs = ([("warm", warm.sequence(warm.sequence_names()[0]))]
            if warm is not None else [])
    seqs += [(n, ds.sequence(n)) for n in ds.sequence_names()]
    for name, src in seqs:
        pregenerate(type("D", (), {"sequence_names": lambda self=None: [name],
                                   "sequence": lambda self, n=None, s=src: s})())
        t0 = time.perf_counter()
        zsd = ZeroShotDetector(src, name, cfg, clip_model=clip_model)
        zsd.process()
        wall = time.perf_counter() - t0
        budgets.append((name, wall, dict(zsd.stage_times)))
    for name, wall, st in budgets:
        n_frames = 24 if scale == "full" else 8
        print(f"\n== {name}: wall={wall:.2f}s  fps={n_frames/wall:.2f}")
        for k, v in sorted(st.items(), key=lambda kv: -kv[1]):
            print(f"  {k:28s} {v:7.3f}s  {100*v/wall:5.1f}%")


if __name__ == "__main__":
    main()
