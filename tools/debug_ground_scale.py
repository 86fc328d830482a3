"""Bisect the ground-stage wall blowup vs frame count (r5).

MICROBENCH (healthy chip, f_pad=24): presort 40 ms + scan 509 ms per
24-frame sequence. The full-caps soak and debug runs saw 137-486 s at
f_pad 64/200. Measure presort / scan / compact separately at increasing
f_pad with explicit device syncs to find what scales wrong.

Usage: python tools/debug_ground_scale.py [--fpads 24,48,64]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    fpads = [24, 48, 64]
    if "--fpads" in sys.argv:
        fpads = [int(x) for x in
                 sys.argv[sys.argv.index("--fpads") + 1].split(",")]
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vilgod_tpu.data import SyntheticDataset
    from vilgod_tpu.ground.patchwork import (GroundConfig, _presort_frame,
                                             _segment_presorted,
                                             init_ground_state,
                                             segment_sequence)

    print(f"# platform={jax.devices()[0].platform}", file=sys.stderr)
    gcfg = GroundConfig()

    n_pts = 139264  # soak-scene raw bucket
    ds = SyntheticDataset(n_sequences=1, n_frames=max(fpads), seed=21,
                          n_ground=120000, n_vehicles=12, n_pedestrians=6,
                          n_cyclists=4, n_moving=6, area=90.0)
    seq = ds.sequence("synth_0")
    pts = np.zeros((max(fpads), n_pts, 4), np.float32)
    msk = np.zeros((max(fpads), n_pts), bool)
    for f in range(max(fpads)):
        p = seq.get_lidar_points(f)
        n = min(len(p), n_pts)
        pts[f, :n] = p[:n, :4]
        msk[f, :n] = True

    presort_v = jax.jit(jax.vmap(lambda p, m: _presort_frame(p, m, gcfg)))

    def scan_only(points, mask, pre):
        def step(state, inp):
            p, m, pr = inp
            g, state, _ = _segment_presorted(p, m, state, gcfg, *pr)
            return state, g

        _, ground = jax.lax.scan(step, init_ground_state(gcfg),
                                 (points, mask, pre))
        return ground

    scan_jit = jax.jit(scan_only)

    for fp in fpads:
        p_d = jnp.asarray(pts[:fp])
        m_d = jnp.asarray(msk[:fp])
        jax.block_until_ready(p_d)

        t0 = time.perf_counter()
        pre = presort_v(p_d, m_d)
        np.asarray(pre[0][:, :1])  # force
        t_pre_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        pre = presort_v(p_d, m_d)
        np.asarray(pre[0][:, :1])
        t_pre = time.perf_counter() - t0

        t0 = time.perf_counter()
        g = scan_jit(p_d, m_d, pre)
        np.asarray(g[:, :1])
        t_scan_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        g = scan_jit(p_d, m_d, pre)
        np.asarray(g[:, :1])
        t_scan = time.perf_counter() - t0

        t0 = time.perf_counter()
        g2, _ = segment_sequence(p_d, m_d, gcfg, 1.723)
        np.asarray(g2[:, :1])
        t_full_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        g2, _ = segment_sequence(p_d, m_d, gcfg, 1.723)
        np.asarray(g2[:, :1])
        t_full = time.perf_counter() - t0

        print(f"f_pad={fp:4d}: presort {t_pre*1e3:8.1f} ms "
              f"(cold {t_pre_cold:6.1f} s)  scan {t_scan*1e3:9.1f} ms "
              f"(cold {t_scan_cold:6.1f} s)  fused {t_full*1e3:9.1f} ms "
              f"(cold {t_full_cold:6.1f} s)")


if __name__ == "__main__":
    main()
