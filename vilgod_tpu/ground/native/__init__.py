"""ctypes binding for the native ground segmentation.

Plays the role of the reference's pybind11 wrapper
(`/root/reference/third_party/patchwork-plusplus/python_wrapper/
pybinding.cpp`) without the pybind11 dependency: the shared library is
compiled on demand with g++ and exposed through a small Python class.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "patchwork.cpp"
_SO = _DIR / "_patchwork_native.so"

_lib = None


def _build() -> Path:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_library():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build()))
        lib.pw_create.restype = ctypes.c_void_p
        lib.pw_create.argtypes = [ctypes.POINTER(ctypes.c_double), ctypes.c_int]
        lib.pw_destroy.argtypes = [ctypes.c_void_p]
        lib.pw_segment.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.pw_sensor_height.restype = ctypes.c_double
        lib.pw_sensor_height.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativePatchwork:
    """Stateful native ground segmenter (adaptive thresholds persist
    across ``segment`` calls, like the C++ reference)."""

    def __init__(self, cfg=None):
        from ..patchwork import GroundConfig

        cfg = cfg or GroundConfig()
        lib = load_library()
        params = np.array(
            [
                float(cfg.enable_rnr), float(cfg.enable_rvpf), float(cfg.enable_tgr),
                cfg.num_iter, cfg.num_lpr, cfg.num_min_pts, cfg.num_rings_of_interest,
                cfg.rnr_ver_angle_thr, cfg.rnr_intensity_thr, cfg.sensor_height,
                cfg.th_seeds, cfg.th_dist, cfg.th_seeds_v, cfg.th_dist_v,
                cfg.max_range, cfg.min_range, cfg.uprightness_thr,
                cfg.adaptive_seed_selection_margin,
            ],
            dtype=np.float64,
        )
        self._lib = lib
        self._h = lib.pw_create(
            params.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(params))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pw_destroy(self._h)
            self._h = None

    @property
    def sensor_height(self) -> float:
        return float(self._lib.pw_sensor_height(self._h))

    def segment(self, points: np.ndarray) -> np.ndarray:
        """points (N, 4) [x, y, z, intensity] float32 -> ground mask (N,)."""
        pts = np.ascontiguousarray(points[:, :4], dtype=np.float32)
        out = np.zeros(len(pts), np.uint8)
        self._lib.pw_segment(
            self._h,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(pts),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out.astype(bool)
