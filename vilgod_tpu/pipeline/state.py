"""Array-resident per-sequence state (struct-of-arrays LidarFrame store).

TPU-native replacement for the reference's per-frame Python object store
(`/root/reference/src/vilgod/lidar_frame.py`) and Detection dataclass soup
(`src/dataclass/objects.py:37-199`). One :class:`SequenceState` holds the
whole sequence as fixed-capacity padded arrays:

- per-frame raw points stay in the sensor frame; world-frame ("ref")
  coordinates are derived via the pose chain (`lidar_frame.py:25-26,66-69`);
- non-ground points are *compacted* into a second padded buffer so that
  the entropy / clustering / detection stages run on dense arrays sized
  for the real workload instead of the raw cloud;
- detections are rows of per-frame tables, not objects: a cluster label
  image ``labels (F, N)`` plus per-detection columns (valid/static/tid/
  box/class), mirroring the serialized whitelist at `objects.py:88-103`;
- tracks are rows of a per-sequence pool (see tracking/).

Device residency: the per-point buffers live on the accelerator between
stages. The hosted TPU sits behind a ~36 MB/s tunnel, so the raw cloud
uploads ONCE (int16-quantized at 5 mm -> 2.5x fewer bytes, dequantized
on device) and the derived buffers (ground mask, compacted non-ground
cloud, entropy, cluster labels) are *born on device* and only download
lazily when host code actually reads them (checkpoint save, debug dumps,
tests). Stage-to-stage traffic is a handful of tiny per-detection tables.

Checkpoint/resume keeps the reference's semantics (`lidar_frame.py:40-59`):
entropy is stored sparsely below 0.9 (`zero_shot_detector.py:188-190`),
cluster points are never stored — they are re-derived from indices.
The cache file is one ``.npz`` per sequence.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

# Detection class codes (mapped classes). Order matters: the first three
# are the dataset class_names, Background last.
CLS_NONE = -1
MAPPED_CLASSES = ("Vehicle", "Pedestrian", "Cyclist", "Background")

# static_track tri-state (reference: None/False/True, objects.py:59)
ST_UNSET = -1
ST_MOVING = 0
ST_STATIC = 1

# raw-point quantization: int16 at 5 mm covers +-163 m (max_range is 80 m)
# and is ~4x below the sensor's own noise floor; intensity in [0, 1]
# quantizes to 0.005 steps, far finer than the RNR threshold of 0.2
POINT_QUANT = 0.005

# per-point buffers that live on device between stages; host mirrors
# download lazily. Values are the "unset" fill for the padded tail.
_LAZY = {
    "ground_mask": False,
    "ng_xyz": 0.0,
    "ng_mask": False,
    "ng_src": -1,
    "ng_entropy": 1.0,
    "labels": -1,
    "probs": 0.0,
}


@dataclass
class Capacity:
    """Fixed padded-buffer sizes (XLA needs static shapes)."""

    max_points: int = 196608        # raw per-frame cloud
    max_ng_points: int = 131072     # compacted non-ground per-frame cloud
    max_clusters: int = 256         # per-frame detection table
    max_cluster_points: int = 4096  # per-cluster gathered point budget
    max_tracks: int = 1024          # per-sequence track pool
    clip_batch: int = 64

    @classmethod
    def from_cfg(cls, cfg) -> "Capacity":
        cap = (cfg or {}).get("capacity", {}) if hasattr(cfg, "get") else {}
        return cls(
            max_points=cap.get("max_points", 196608),
            max_ng_points=cap.get("max_ng_points", cap.get("max_ground_points", 131072)),
            max_clusters=cap.get("max_clusters", 256),
            max_cluster_points=cap.get("max_cluster_points", 4096),
            max_tracks=cap.get("max_tracks", 1024),
            clip_batch=cap.get("clip_batch", 64),
        )


@dataclass
class SequenceState:
    """All per-sequence pipeline state as padded arrays.

    F = n_frames, P = max_points, N = max_ng_points, C = max_clusters.
    Heavy per-stage compute happens in jitted kernels over device-resident
    buffers; the host arrays are lazily-synced mirrors and the checkpoint
    unit. The per-point buffers listed in ``_LAZY`` are exposed as
    properties — reading one downloads the device-canonical value first.
    """

    name: str
    caps: Capacity
    # raw frames -------------------------------------------------------
    # stored int16 at the 5 mm upload lattice from set_frame on: nothing
    # host-side reads raw coordinates (every stage consumes the device
    # dequant), and quantizing per frame at ingest replaces the 230 MB
    # 4-pass conversion chain the upload path used to run over the f32
    # mirror (~2 s/sequence of this host's one core)
    points: np.ndarray        # (F, P, 4) int16, [x y z intensity] / 5 mm
    points_mask: np.ndarray   # (F, P) bool
    poses: np.ndarray         # (F, 4, 4) sensor->world
    # stage 1: ground segmentation (lazy: _h_ground_mask) --------------
    _h_ground_mask: np.ndarray   # (F, P) bool; True = ground (valid pts only)
    plane_ref: np.ndarray     # (F, 4) RANSAC ground plane, world frame; NaN=unset
    # compacted non-ground world-frame buffer (lazy) -------------------
    _h_ng_xyz: np.ndarray     # (F, N, 3) world frame
    _h_ng_mask: np.ndarray    # (F, N) bool
    _h_ng_src: np.ndarray     # (F, N) int32 index into raw buffer
    # stage 2: entropy (lazy) ------------------------------------------
    _h_ng_entropy: np.ndarray  # (F, N) float32, 1.0 default
    # stage 3: clustering / detections ---------------------------------
    _h_labels: np.ndarray     # (F, N) int32, -1 noise, else [0, C)
    _h_probs: np.ndarray      # (F, N) float32
    det_n: np.ndarray         # (F, C) int32 point count (0 = no detection)
    det_valid: np.ndarray     # (F, C) bool
    det_static: np.ndarray    # (F, C) bool (epochal motion, objects.py:40-43)
    det_static_track: np.ndarray  # (F, C) int8 tri-state (track motion)
    det_tid: np.ndarray       # (F, C) int32, -1 unassigned
    det_center: np.ndarray    # (F, C, 3) mass center (median), world frame
    det_box: np.ndarray       # (F, C, 7) world frame, NaN = unfitted
    det_cls: np.ndarray       # (F, C) int32 index into MAPPED_CLASSES, -1 none
    det_score: np.ndarray     # (F, C) float32
    # misc ------------------------------------------------------------
    done: dict = field(default_factory=dict)   # stage-name -> bool
    tracks: "object" = None   # TrackPool, attached by the tracking stage
    _ng_counts: np.ndarray = None  # (F,) non-ground occupancy, set by stage 1
    _dev: dict = field(default_factory=dict, repr=False)    # device cache
    _canon: dict = field(default_factory=dict, repr=False)  # name -> _dev key
    _stale: set = field(default_factory=set, repr=False)    # host mirrors stale

    # -- construction --------------------------------------------------
    @classmethod
    def allocate(cls, name: str, n_frames: int, caps: Capacity, n_feat: int = 5):
        F, P, N, C = n_frames, caps.max_points, caps.max_ng_points, caps.max_clusters
        return cls(
            name=name,
            caps=caps,
            points=np.zeros((F, P, min(n_feat, 4)), np.int16),
            points_mask=np.zeros((F, P), bool),
            poses=np.tile(np.eye(4, dtype=np.float32), (F, 1, 1)),
            _h_ground_mask=np.zeros((F, P), bool),
            plane_ref=np.full((F, 4), np.nan, np.float32),
            _h_ng_xyz=np.zeros((F, N, 3), np.float32),
            _h_ng_mask=np.zeros((F, N), bool),
            _h_ng_src=np.full((F, N), -1, np.int32),
            _h_ng_entropy=np.ones((F, N), np.float32),
            _h_labels=np.full((F, N), -1, np.int32),
            _h_probs=np.zeros((F, N), np.float32),
            det_n=np.zeros((F, C), np.int32),
            det_valid=np.zeros((F, C), bool),
            det_static=np.ones((F, C), bool),
            det_static_track=np.full((F, C), ST_UNSET, np.int8),
            det_tid=np.full((F, C), -1, np.int32),
            det_center=np.zeros((F, C, 3), np.float32),
            det_box=np.full((F, C, 7), np.nan, np.float32),
            det_cls=np.full((F, C), CLS_NONE, np.int32),
            det_score=np.zeros((F, C), np.float32),
        )

    # -- basic derived quantities --------------------------------------
    @property
    def n_frames(self) -> int:
        return self.points.shape[0]

    def transform_to_ref(self, fnr: int) -> np.ndarray:
        """Sensor -> world-of-frame-0 (lidar_frame.py:25)."""
        return np.linalg.inv(self.poses[0]) @ self.poses[fnr]

    def transform_to_ego(self, fnr: int) -> np.ndarray:
        """World-of-frame-0 -> sensor (lidar_frame.py:26)."""
        return np.linalg.inv(self.poses[fnr]) @ self.poses[0]

    def set_frame(self, fnr: int, points: np.ndarray, pose: np.ndarray):
        n = min(len(points), self.caps.max_points)
        # quantize at ingest (bit-identical to the old upload-time chain:
        # same divide / rint / clip over f32) — per-frame slices stay in
        # cache, and the f32 mirror never exists
        c = min(points.shape[1], self.points.shape[2])
        w = np.ascontiguousarray(points[:n, :c], dtype=np.float32)
        np.divide(w, np.float32(POINT_QUANT), out=w)
        np.rint(w, out=w)
        np.clip(w, -32767, 32767, out=w)
        self.points[fnr, :n, :c] = w.astype(np.int16)
        self.points_mask[fnr, :n] = True
        self.poses[fnr] = pose

    # -- device residency ----------------------------------------------
    def _host_array(self, name: str) -> np.ndarray:
        """Host mirror of a lazy buffer, synced down if a device-canonical
        version is newer."""
        host = getattr(self, "_h_" + name)
        if name not in self._stale:
            return host
        key = self._canon[name]
        arr = np.asarray(self._dev[key])
        f = min(self.n_frames, arr.shape[0])
        host[...] = _LAZY[name]
        if host.ndim >= 2 and arr.shape[1] != host.shape[1]:
            host[:f, : arr.shape[1]] = arr[:f]
        else:
            host[:f] = arr[:f]
        self._stale.discard(name)
        return host

    def put_device(self, name: str, arr, f_pad: int, n_points: int):
        """Install a freshly computed device value as the canonical copy
        of a lazy buffer; the host mirror becomes stale until read."""
        assert name in _LAZY, name
        for key in list(self._dev):
            if key[0] == name:
                del self._dev[key]
        key = (name, f_pad, n_points)
        self._dev[key] = arr
        self._canon[name] = key
        self._stale.add(name)
        if name in ("labels", "ng_mask", "ng_xyz"):
            for key in list(self._dev):
                if key[0] == "det_tables":
                    del self._dev[key]

    def device(self, name: str, f_pad: int | None = None,
               n_points: int | None = None):
        """Device-resident copy of a per-frame array, padded to ``f_pad``
        frames and sliced to ``n_points`` along the point axis.

        Resolution order: exact cached entry -> slice/pad of the canonical
        device buffer (stages hand buffers to each other without touching
        the host) -> upload from the host mirror. Host->device bandwidth
        is the pipeline's scarcest resource (~36 MB/s tunnel), so raw
        points upload int16-quantized and every buffer uploads at most
        once per mutation. Point-axis slicing is safe because every
        buffer is front-compacted."""
        import jax.numpy as jnp

        key = (name, f_pad, n_points)
        if key in self._dev:
            return self._dev[key]

        canon = self._canon.get(name)
        if canon is not None:
            arr = self._dev[canon]
            if (n_points is not None and arr.ndim >= 2
                    and n_points != arr.shape[1]):
                if n_points <= arr.shape[1]:
                    arr = arr[:, :n_points]
                else:
                    pad = [(0, 0)] * arr.ndim
                    pad[1] = (0, n_points - arr.shape[1])
                    arr = jnp.pad(arr, pad, constant_values=_LAZY[name])
            if f_pad is not None and f_pad != arr.shape[0]:
                if f_pad < arr.shape[0]:
                    arr = arr[:f_pad]
                else:
                    pad = [(0, 0)] * arr.ndim
                    pad[0] = (0, f_pad - arr.shape[0])
                    arr = jnp.pad(arr, pad, constant_values=_LAZY[name])
            self._dev[key] = arr
            return arr

        if name == "points_mask":
            # points are front-compacted per frame, so the mask is fully
            # described by the (F,) occupancy counts — build it on device
            # instead of pushing F x P bools through the tunnel
            counts = self.points_mask.sum(axis=1).astype(np.int32)
            if f_pad and f_pad > len(counts):
                counts = np.concatenate(
                    [counts, np.zeros(f_pad - len(counts), np.int32)])
            self._dev[key] = _mask_from_counts_jit(jnp.asarray(counts),
                                                   n_points)
            return self._dev[key]

        host = self._host_array(name) if name in _LAZY else getattr(self, name)
        arr = host
        f_pad = f_pad or arr.shape[0]
        if n_points is not None and arr.ndim >= 2:
            arr = arr[:, :n_points]
        if f_pad > arr.shape[0]:
            pad = np.zeros((f_pad - arr.shape[0],) + arr.shape[1:], arr.dtype)
            arr = np.concatenate([arr, pad])
        if name == "points":
            # already int16-quantized at set_frame; dequantize on device
            # (quantize(0) == 0, so frame padding commutes)
            self._dev[key] = _dequant_jit(jnp.asarray(arr))
        else:
            self._dev[key] = jnp.asarray(arr)
        return self._dev[key]

    def prefetch(self, f_pad: int | None = None):
        """Kick off the big async uploads before the pipeline starts (the
        raw cloud is the single largest transfer; issuing it at init
        overlaps the tunnel copy with host-side setup)."""
        if f_pad is None:
            from .stages_geometry import frame_bucket
            f_pad = frame_bucket(self.n_frames)
        n_pts = self.points_bucket()
        self.device("points", f_pad, n_pts)
        self.device("points_mask", f_pad, n_pts)

    def det_tables(self, f_pad: int, n_ng: int):
        """Device-resident per-frame cluster gather tables
        (F_pad, C, cap) + masks, built once per labels mutation and shared
        by classification / box fitting (ONE device program for all
        frames). ~1 GB at Waymo scale — cheaper than rebuilding a table
        per consumer call."""
        key = ("det_tables", f_pad, n_ng)
        if key not in self._dev:
            labels = self.device("labels", f_pad, n_ng)
            ng_mask = self.device("ng_mask", f_pad, n_ng)
            self._dev[key] = _build_tables_jit(
                labels, ng_mask, self.caps.max_clusters,
                self.caps.max_cluster_points)
        return self._dev[key]

    @staticmethod
    def _bucket_pow2(n: int, lo: int = 8192) -> int:
        b = lo
        while b < n:
            b *= 2
        return b

    def ng_bucket(self) -> int:
        """Multiple-of-8192 bucket (>= 8192) of the max per-frame
        non-ground occupancy: device programs run over the occupied
        prefix instead of the full static capacity. Finer than pow2 —
        neighbor passes scale with the square, so a 33k occupancy must
        bucket to 40960, not 65536."""
        if self._ng_counts is not None:
            used = int(self._ng_counts.max()) if len(self._ng_counts) else 1
        else:
            ng_mask = self._host_array("ng_mask")
            used = int(ng_mask.sum(axis=1).max()) if ng_mask.any() else 1
        b = max(8192, -(-max(used, 1) // 8192) * 8192)
        return min(b, self.caps.max_ng_points)

    def points_bucket(self) -> int:
        """Multiple-of-8192 bucket of the max raw occupancy (finer than
        pow2: the raw cloud is the largest upload, and pow2 padding can
        waste ~30% of the tunnel transfer)."""
        used = int(self.points_mask.sum(axis=1).max()) if self.points_mask.any() else 1
        return min(-(-used // 8192) * 8192, self.caps.max_points)

    def invalidate_device(self, *names: str):
        """Drop device copies after a host-side mutation of ``names``."""
        names = set(names)
        if names & {"labels", "ng_mask", "ng_xyz"}:
            names.add("det_tables")  # derived product
        for key in list(self._dev):
            if key[0] in names:
                del self._dev[key]
        for n in names:
            self._canon.pop(n, None)
            self._stale.discard(n)

    # -- checkpoint / resume -------------------------------------------
    _SAVE_DENSE = (
        "ground_mask", "plane_ref", "ng_src", "labels", "probs",
        "det_n", "det_valid", "det_static", "det_static_track", "det_tid",
        "det_center", "det_box", "det_cls", "det_score",
    )

    def save(self, path: str | Path):
        """Write the stage-output checkpoint (everything not re-derivable
        from the raw frames). Entropy is stored sparsely below 0.9, the
        reference's memory trick (zero_shot_detector.py:188-190)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        ng_entropy = self.ng_entropy
        sel = ng_entropy < 0.9
        f_idx, p_idx = np.nonzero(sel)
        payload = {k: getattr(self, k) for k in self._SAVE_DENSE}
        payload["entropy_frame_idx"] = f_idx.astype(np.int32)
        payload["entropy_point_idx"] = p_idx.astype(np.int32)
        payload["entropy_values"] = ng_entropy[sel].astype(np.float32)
        payload["done_keys"] = np.array(sorted(k for k, v in self.done.items() if v))
        if self.tracks is not None:
            for k, v in self.tracks.serialize().items():
                payload[f"trk_{k}"] = v
        np.savez_compressed(path, **payload)

    def load(self, path: str | Path) -> bool:
        path = Path(path)
        if not path.exists():
            return False
        with np.load(path, allow_pickle=False) as data:
            for k in self._SAVE_DENSE:
                if k in data and data[k].shape == getattr(self, k).shape:
                    getattr(self, k)[...] = data[k]
            self._h_ng_entropy[...] = 1.0
            self._h_ng_entropy[data["entropy_frame_idx"], data["entropy_point_idx"]] = (
                data["entropy_values"])
            self.done = {str(k): True for k in data["done_keys"]}
            trk = {k[4:]: data[k] for k in data.files if k.startswith("trk_")}
            if trk:
                from ..tracking.tracker import TrackPool
                self.tracks = TrackPool.deserialize(trk)
        # the freshly loaded host arrays are now canonical
        self._dev.clear()
        self._canon.clear()
        self._stale.clear()
        # ng buffer geometry must be rebuilt from raw frames by the runner
        return True


def _make_lazy_property(name: str):
    def get(self: SequenceState) -> np.ndarray:
        return self._host_array(name)

    get.__name__ = name
    get.__doc__ = f"Host mirror of `{name}` (lazily synced from device)."
    return property(get)


for _name in _LAZY:
    setattr(SequenceState, _name, _make_lazy_property(_name))


def _mask_from_counts_jit(counts, n_points):
    import jax
    import jax.numpy as jnp

    global _MASK_COUNTS_COMPILED
    try:
        fn = _MASK_COUNTS_COMPILED
    except NameError:
        from functools import partial

        @partial(jax.jit, static_argnames=("n",))
        def fn(counts, n):
            return jnp.arange(n)[None, :] < counts[:, None]

        _MASK_COUNTS_COMPILED = fn
    return fn(counts, n=n_points)


def _dequant_jit(q):
    """int16 raw points -> f32 on device (module-level single compile)."""
    import jax
    import jax.numpy as jnp

    global _DEQUANT_COMPILED
    try:
        fn = _DEQUANT_COMPILED
    except NameError:
        fn = jax.jit(lambda q: q.astype(jnp.float32) * POINT_QUANT)
        _DEQUANT_COMPILED = fn
    return fn(q)


def _build_tables_jit(labels, ng_mask, num_clusters, capacity):
    """All-frames cluster gather tables in ONE device program."""
    from functools import partial

    import jax

    global _BUILD_TABLES_COMPILED
    try:
        fn = _BUILD_TABLES_COMPILED
    except NameError:
        import jax.numpy as jnp

        from ..ops.cluster import build_cluster_table

        @partial(jax.jit, static_argnames=("num_clusters", "capacity"))
        def fn(labels, ng_mask, num_clusters, capacity):
            return jax.lax.map(
                lambda f: build_cluster_table(labels[f], ng_mask[f],
                                              num_clusters, capacity),
                jnp.arange(labels.shape[0]))

        _BUILD_TABLES_COMPILED = fn
    return fn(labels, ng_mask, num_clusters=num_clusters, capacity=capacity)
