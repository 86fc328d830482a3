"""Stepwise isolation of the f_pad=200 clustering TPU worker crash (r5).

Feeds synthetic non-ground buffers straight into the clustering stage's
internals (stats -> chunk launches -> table concat -> pack download),
syncing and printing after every step so the crashing op is named.

Usage: python tools/debug_cluster_stepwise.py [--frames 200] [--no-pallas]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if "--no-pallas" in sys.argv:
    os.environ["VILGOD_NO_PALLAS"] = "1"

import numpy as np  # noqa: E402


def step(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"  {label:40s} {time.perf_counter() - t0:8.2f} s", flush=True)
    return out


def main():
    frames = 200
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vilgod_tpu.pipeline.stages_geometry import (cluster_frames_chunk,
                                                     frame_select_stats_all)

    print(f"# platform={jax.devices()[0].platform} frames={frames} "
          f"pallas={'off' if os.environ.get('VILGOD_NO_PALLAS') else 'on'}",
          flush=True)

    f_pad, n_ng = frames, 40960
    rng = np.random.default_rng(0)
    ng = np.zeros((f_pad, n_ng, 3), np.float32)
    msk = np.zeros((f_pad, n_ng), bool)
    occ = 33000
    for f in range(f_pad):
        # a dozen dense blobs + uniform background, 5 mm lattice
        pts = []
        for b in range(12):
            c = rng.uniform(-40, 40, 3) * np.array([1, 1, 0.02])
            pts.append(c + rng.normal(scale=0.5, size=(2000, 3)))
        pts.append(rng.uniform(-45, 45, size=(occ - 24000, 3)))
        p = np.concatenate(pts).astype(np.float32)
        p = (np.round(p / 0.005) * 0.005).astype(np.float32)
        ng[f, :occ] = p
        msk[f, :occ] = True
    ent = rng.uniform(0, 1, (f_pad, n_ng)).astype(np.float32)
    fv = np.ones(f_pad, bool)

    dev_args = step("upload", lambda: tuple(map(jnp.asarray, (ng, msk, ent, fv))))
    jax.block_until_ready(dev_args)

    stats = step("frame_select_stats_all",
                 lambda: jax.block_until_ready(
                     frame_select_stats_all(*dev_args)))

    cap_in = 40960
    kw = dict(n_frames_window=2, cap_in=cap_in, eps=0.15, min_samples=5,
              min_cluster_size=15, prob_threshold=0.3, ephe_percentile=30.0,
              ephe_min_score=0.5, max_clusters=256, capacity=4096)
    chunk = min(f_pad, 32)
    starts = list(range(0, f_pad - chunk + 1, chunk))
    if starts[-1] + chunk < f_pad:
        starts.append(f_pad - chunk)

    resident = None
    if "--ballast" in sys.argv:
        # mimic the soak's resident set (points f32 + ng buffers at full
        # cap + masks): if launches crash only under this pressure, the
        # failure is device/worker memory, not a kernel fault
        gb = float(sys.argv[sys.argv.index("--ballast") + 1])
        n_el = int(gb * (1 << 30) / 4)
        resident = jnp.ones((n_el,), jnp.float32)
        step("ballast", lambda: np.asarray(resident[:1]))

    sync_each = "--async" not in sys.argv
    outs = []
    for f0 in starts:
        # on the axon runtime block_until_ready does not wait for
        # execution — a 1-element download forces it (runner.py note)
        def run(f0=f0):
            o = cluster_frames_chunk(*dev_args, stats, f0, 666,
                                     chunk=chunk, **kw)
            if sync_each:
                np.asarray(o[0][:1, :1])
            return o
        outs.append(step(f"cluster_frames_chunk f0={f0}", run))

    stacked = step("concat 6 outputs",
                   lambda: jax.block_until_ready(
                       [jnp.concatenate([o[i] for o in outs])
                        for i in range(6)]))
    det = step("pack + download",
               lambda: np.asarray(stacked[2]))
    print(f"# OK: det_n total={int(det.sum())}")


if __name__ == "__main__":
    main()
