"""Config-driven pipeline runner (the ZeroShotDetector equivalent).

Mirrors the reference orchestrator's contract
(`/root/reference/src/vilgod/zero_shot_detector.py:24-69`): the pipeline
is an ordered list of ``{name, args}`` entries in the config, and
``pipeline_active`` selects/orders execution; stage names resolve through
a registry instead of ``getattr`` dispatch. Per-sequence stage outputs
checkpoint to one ``.npz`` (the reference's pickle sync,
`zero_shot_detector.py:105-123`), giving the same stage-level idempotent
resume: a crash loses at most the current stage of one sequence.
"""
from __future__ import annotations

import logging
import os
import time
from pathlib import Path

import numpy as np

from .stages_boxes import (evaluate_sequence, fit_bounding_boxes_simple,
                           propagate_labels, track_clusters)
from .stages_classify import classification
from .stages_geometry import (calculate_entropy_scores, filter_detections,
                              mask_ground_points, rebuild_ng_buffers,
                              spatial_clustering)
from .state import Capacity, SequenceState

log = logging.getLogger("vilgod_tpu")

STAGE_REGISTRY = {
    "mask_ground_points": mask_ground_points,
    "calculate_entropy_scores": calculate_entropy_scores,
    "spatial_clustering": spatial_clustering,
    "filter_detections": filter_detections,
    "track_clusters": track_clusters,
    "classification": classification,
    "fit_bounding_boxes_simple": fit_bounding_boxes_simple,
    "propagate_labels": propagate_labels,
    "evaluate_sequence": evaluate_sequence,
}


class ZeroShotDetector:
    """Per-sequence pipeline driver over a :class:`SequenceState`."""

    def __init__(self, source, name: str, cfg, clip_model=None,
                 cache_dir: str | Path | None = None):
        self.cfg = cfg
        self.name = name
        self.source = source
        self.clip_model = clip_model
        self.cache_path = (Path(cache_dir) / f"{name}.npz") if cache_dir else None
        self.stage_times: dict[str, float] = {}

        caps = Capacity.from_cfg(cfg)
        n = source.sequence_length
        self.state = SequenceState.allocate(name, n, caps)
        for fnr in range(n):
            self.state.set_frame(fnr, source.get_lidar_points(fnr),
                                 source.get_pose(fnr))
        if self.cache_path is not None and self.state.load(self.cache_path):
            log.info("Restored cached state for %s (%s)", name,
                     ",".join(sorted(self.state.done)))
            rebuild_ng_buffers(self.state)
        # start the raw-cloud upload now (async): the ~36 MB/s tunnel copy
        # overlaps the remaining host-side setup instead of stalling the
        # first device program inside process()
        self.state.prefetch()
        self.detection_3d_result_list: list[dict] = []

    def process(self) -> list[dict]:
        """Run the active pipeline. With ``cfg.profile_dir`` set, each
        stage is wrapped in a ``jax.profiler`` trace annotation and the
        whole run captures a device trace — the observability the
        reference lacks entirely (SURVEY §5: tqdm bars were its only
        runtime visibility)."""
        profile_dir = self.cfg.get("profile_dir")
        if profile_dir:
            import jax
            jax.profiler.start_trace(str(profile_dir))
        try:
            self._process_stages()
        finally:
            if profile_dir:
                import jax
                jax.profiler.stop_trace()
                log.info("Device trace written to %s", profile_dir)
        if getattr(self.state, "detection_3d_result_list", None) is not None:
            self.detection_3d_result_list = self.state.detection_3d_result_list
        return self.detection_3d_result_list

    def _process_stages(self):
        pipeline = {p["name"]: p.get("args", {}) for p in self.cfg.get("pipeline", [])}
        for task_name in self.cfg.get("pipeline_active", []):
            if task_name not in pipeline:
                log.warning("%s NOT FOUND!!!", task_name)
                continue
            fn = STAGE_REGISTRY[task_name]
            args = dict(pipeline[task_name])
            if task_name == "classification":
                args["clip_model"] = self.clip_model
            t0 = time.perf_counter()
            before = self.state.done.get(task_name, False)
            if self.cfg.get("profile_dir"):
                import jax
                with jax.profiler.TraceAnnotation(task_name):
                    fn(self.state, self.cfg, **args)
            else:
                fn(self.state, self.cfg, **args)
            if os.environ.get("VILGOD_SYNC_STAGES"):
                # debugging/profiling: attribute async device work to the
                # stage that enqueued it (normally it overlaps host code
                # and syncs at the next download). On the tunneled axon
                # runtime block_until_ready does NOT wait for execution —
                # only a host download forces it — so pack one tiny
                # download that depends on every resident buffer.
                # CAVEAT (measured, tools/reconcile_timing.py): each
                # stage's distinct leaf set compiles a fresh
                # jit(concatenate), and cold-cache recompiles/upload
                # flushes bill to whichever stage syncs first — r4's
                # breakdown read 4.3x the wall this way. bench.py now
                # uses prefix differencing instead; treat these numbers
                # as ordering hints only, never as a budget.
                import jax.numpy as _jnp
                leaves = []
                for v in self.state._dev.values():
                    for a in (v if isinstance(v, tuple) else (v,)):
                        leaves.append(a.ravel()[:1].astype(_jnp.float32))
                if leaves:
                    np.asarray(_jnp.concatenate(leaves))
            self.stage_times[task_name] = time.perf_counter() - t0
            log.info("[%s] %s: %.2fs", self.name, task_name,
                     self.stage_times[task_name])
            ran = self.state.done.get(task_name, False) and not before
            if ran and self.cache_path is not None:
                self.state.save(self.cache_path)


def run_sequences(dataset, cfg, clip_model=None, cache_dir=None,
                  result_dir=None, shard_hosts: bool = True,
                  prefetch_next: bool = True,
                  stage_times: dict | None = None) -> list[dict]:
    """Sequence loop (tools/preprocess_data.py:73-107): process every
    sequence and concatenate per-frame detection dicts in order.

    Under ``jax.distributed`` multi-host runs each host takes a strided
    slice of the sequence list — sequences are fully independent
    (the reference proves it: its CLI loop is the parallelizable unit),
    so the DCN axis needs zero communication; per-sequence results land
    in the shared ``result_dir`` and any host can re-score the union.
    """
    names = dataset.sequence_names()
    try:
        import jax
        pidx, pcnt = jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover - uninitialized backend
        pidx, pcnt = 0, 1
    if shard_hosts and pcnt > 1:
        names = list(names)[pidx::pcnt]

    def cached(seq_name):
        return (Path(result_dir) / f"{seq_name}.npz") if result_dir else None

    def build(seq_name):
        return ZeroShotDetector(dataset.sequence(seq_name), seq_name, cfg,
                                clip_model=clip_model, cache_dir=cache_dir)

    all_results = []
    prebuilt: tuple | None = None  # (name, Future[ZeroShotDetector])
    names = list(names)
    # the next sequence builds on a WORKER THREAD while the current one
    # processes: the constructor's host work (frame copies, int16
    # quantization, ~2 s at Waymo scale) and its async tunnel upload both
    # ride under the current sequence's device programs instead of
    # serializing with them (numpy + jax dispatch release the GIL)
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=1,
                              thread_name_prefix="vilgod-prefetch")
    try:
        for i, seq_name in enumerate(names):
            result_path = cached(seq_name)
            if result_path is not None and result_path.exists():
                with np.load(result_path, allow_pickle=True) as d:
                    all_results.extend(list(d["results"]))
                continue
            if prebuilt is not None and prebuilt[0] == seq_name:
                zsd = prebuilt[1].result()
            else:
                if prebuilt is not None:
                    prebuilt[1].result()  # never abandon a running build
                zsd = build(seq_name)
            prebuilt = None
            if prefetch_next and not os.environ.get("VILGOD_NO_SEQ_PREFETCH"):
                for nxt in names[i + 1:]:
                    p = cached(nxt)
                    if p is None or not p.exists():
                        prebuilt = (nxt, pool.submit(build, nxt))
                        break
            results = zsd.process()
            if stage_times is not None:
                for k, v in zsd.stage_times.items():
                    stage_times[k] = stage_times.get(k, 0.0) + v
            if result_path is not None:
                result_path.parent.mkdir(parents=True, exist_ok=True)
                np.savez_compressed(result_path,
                                    results=np.array(results, dtype=object))
            all_results.extend(results)
        if prebuilt is not None:
            prebuilt[1].result()
    finally:
        pool.shutdown(wait=True)
    return all_results
