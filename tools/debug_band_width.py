"""Measure banded-pass cost vs static band width on REAL chunk inputs.

The single-launch kernels skip grid steps past each block's true span,
but every grid step still prefetches its data tile and pays grid
iteration — so the static w_band may set the pass cost even when true
spans are 3x smaller. This times count3/min-label/nearest at several
static widths on the bench-scale chunk input.

Usage: python tools/debug_band_width.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tools.microbench import build_state

    from tools.microbench import _cluster_inputs
    state, cfg, _scale = build_state()
    dev_args, stats, sel, feats, fmask, cap_in, chunk = _cluster_inputs(
        state, cfg)
    flat_feats = feats.reshape(chunk * cap_in, 5)
    flat_mask = fmask.reshape(chunk * cap_in)
    pages = jnp.repeat(jnp.arange(chunk, dtype=jnp.int32), cap_in)

    from vilgod_tpu.ops.banded import (banded_min_label, banded_nearest,
                                       banded_radius_count3, block_windows)
    from vilgod_tpu.ops.cluster import PAGE_ISO, paged_cell_sort
    from vilgod_tpu.ops.pallas_kernels import TD, TQ, TQ_HEAVY, prep_t8

    n = chunk * cap_in
    order, cid_sorted = paged_cell_sort(flat_feats, flat_mask, pages, chunk)
    iso = (pages.astype(flat_feats.dtype) * PAGE_ISO)[:, None]
    pts_iso = jnp.concatenate([flat_feats, iso], axis=1)
    pts_s, msk_s = pts_iso[order], flat_mask[order]
    pts_t8 = prep_t8(pts_s, msk_s, 1)
    eps, fac = 0.15, 2.0
    levels = jnp.asarray([eps, eps * fac ** 0.5, eps * fac], jnp.float32)
    r2 = jnp.full(n, (eps * fac) ** 2, jnp.float32)
    lab = jnp.arange(n, dtype=jnp.int32).astype(jnp.float32)

    def sync(x):
        return np.asarray(jnp.ravel(x)[:1])

    invalid = chunk * 2048 * 2048  # GRID^2 per page
    from vilgod_tpu.ops.banded import GRID
    invalid = chunk * GRID * GRID

    for w_band in (8192, 10240, 14336, 20480):
        st_h, en_h, ovf_h = block_windows(cid_sorted, cid_sorted, TQ_HEAVY,
                                          w_band, invalid_cid=invalid)
        st_l, en_l, ovf_l = block_windows(cid_sorted, cid_sorted, TQ,
                                          w_band, invalid_cid=invalid)
        print(f"w_band={w_band} ovf_h={bool(ovf_h)} ovf_l={bool(ovf_l)}")

        def timeit(label, fn):
            fn()
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                sync(fn())
                ts.append(time.perf_counter() - t0)
            print(f"  {label:28s} {np.median(ts) * 1e3:7.1f} ms")

        timeit("count3", lambda: banded_radius_count3(
            pts_t8, pts_t8, st_h, levels * levels, TQ_HEAVY, w_band,
            ndim=5, ends=en_h))
        timeit("min_label", lambda: banded_min_label(
            pts_t8, r2, lab, st_h, TQ_HEAVY, w_band, 5, 2 ** 30, ends=en_h))
        timeit("nearest", lambda: banded_nearest(
            pts_t8, pts_t8, st_l, TQ, w_band, ndim=5, ends=en_l))


if __name__ == "__main__":
    main()
