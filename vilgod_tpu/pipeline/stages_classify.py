"""Stage 6: zero-shot CLIP classification of clusters.

TPU-native re-implementation of `zero_shot_detector.py:329-420` +
`lidar_frame.update_object_classes` (`lidar_frame.py:260-291`): clusters
are rendered as 4-view depth images and classified by CLIP in one fused
device graph (render -> encode -> logits); the reference instead
round-trips every cluster through PIL one at a time.
"""
from __future__ import annotations

import numpy as np

from .state import CLS_NONE, MAPPED_CLASSES, SequenceState


def _vote(mapped_names: list[str], scores: np.ndarray) -> tuple[str, float]:
    """View-vote aggregation (lidar_frame.py:269-283): majority class,
    ties broken by the highest per-class mean score; the winner's score is
    the mean over its views."""
    names, counts = np.unique(mapped_names, return_counts=True)
    arr = np.asarray(mapped_names)
    if np.sum(counts[np.argmax(counts)] == counts) > 1:
        best_name, best_score = None, 0.0
        for name in names:
            s = float(np.mean(scores[arr == name]))
            if s > best_score:
                best_name, best_score = name, s
        return best_name, best_score
    name = names[np.argmax(counts)]
    return name, float(np.mean(scores[arr == name]))


def dump_depth_images(state: SequenceState, cfg, out_dir,
                      image_size: int = 224):
    """Debug artifact: rendered multi-view depth images per valid
    detection (the reference writes one PIL image per detection to
    ``../output_images/<sequence>/``, zero_shot_detector.py:331-332,
    lidar_frame.py:289-291). Saved as ``<frame>_<cluster>_<view>.png``."""
    from pathlib import Path

    import jax.numpy as jnp

    from ..ops.rasterize import render_cluster_views
    from .stages_boxes import _batch_tables

    out = Path(out_dir) / state.name
    out.mkdir(parents=True, exist_ok=True)
    pre = cfg.get("preprocessor", {})
    proj = pre.get("lidar_image_projection", {})
    todo = [(f, int(c)) for f in range(state.n_frames)
            for c in np.flatnonzero(state.det_valid[f])]
    for i in range(0, len(todo), 16):
        chunk = todo[i:i + 16]
        pts, mask = _batch_tables(state, chunk, pad_to=16)
        for j, (f, _) in enumerate(chunk):
            t = state.transform_to_ego(f)
            pts[j] = pts[j] @ t[:3, :3].T + t[:3, 3]
            pts[j][~mask[j]] = 0.0
        images = np.asarray(render_cluster_views(
            jnp.asarray(pts), jnp.asarray(mask),
            resolution=proj.get("resolution", 112), depth=proj.get("depth", 8),
            obj_ratio=proj.get("obj_ratio", 0.8),
            depth_bias=proj.get("depth_bias", 0.2), image_size=image_size))
        for j, (f, c) in enumerate(chunk):
            for v in range(images.shape[1]):
                img = (np.clip(images[j, v], 0, 1) * 255).astype(np.uint8)
                try:
                    from PIL import Image
                    Image.fromarray(img).save(out / f"{f:04d}_{c:03d}_{v}.png")
                except ImportError:  # pragma: no cover
                    np.save(out / f"{f:04d}_{c:03d}_{v}.npy", img)


def classification(state: SequenceState, cfg, clip_model=None,
                   image_size: int = 224, aggregation: str = "voting",
                   valid_only: bool = True, missing_only: bool = False,
                   image_out_dir=None, force: bool = False, **_):
    if clip_model is None:
        return  # geometry-only ablation: downstream falls back to size priors
    if state.done.get("classification") and not force and not missing_only:
        return
    if aggregation != "voting":
        raise NotImplementedError(aggregation)

    pre = cfg.get("preprocessor", {})
    proj = pre.get("lidar_image_projection", {})
    resolution = proj.get("resolution", 112)
    depth = proj.get("depth", 8)
    obj_ratio = proj.get("obj_ratio", 0.8)
    depth_bias = proj.get("depth_bias", 0.2)
    batch = state.caps.clip_batch

    mapping = clip_model.class_mapping
    class_list = clip_model.class_list

    from .stages_geometry import frame_bucket
    f_pad = frame_bucket(state.n_frames)
    n_ng = state.ng_bucket()
    ng_xyz = state.device("ng_xyz", f_pad, n_ng)
    tables, table_masks = state.det_tables(f_pad, n_ng)
    classify = clip_model.make_cluster_classifier(
        state.caps.max_clusters, state.caps.max_cluster_points,
        resolution=resolution, depth=depth, obj_ratio=obj_ratio,
        depth_bias=depth_bias, image_size=image_size)

    # multi-chip: cluster batches are embarrassingly parallel, so the
    # batch axis of the fused render->encode->logits program shards over
    # the mesh's dp axis (each device runs the full ViT on 1/D of the
    # batch; the resident sequence buffers replicate ONCE per stage
    # invocation, not per chunk). The reference runs CLIP on one GPU
    # with host-side PIL batching (zero_shot_detector.py:389-410).
    import jax as _jax
    # local_device_count: under multi-host runs each host processes its
    # own sequences (runner.run_sequences strides them), so per-sequence
    # stage meshes must span only addressable devices — device_put of
    # host-local arrays onto a global mesh would fail.
    n_dev = _jax.local_device_count()
    mesh_sh = None
    if (n_dev > 1 and batch % n_dev == 0
            and cfg.get("parallel", {}).get("shard_clip", True)):
        from ..parallel import frame_sharding, make_mesh, replicated
        mesh = make_mesh(n_dev)
        repl = replicated(mesh)
        ng_xyz = _jax.device_put(ng_xyz, repl)
        tables = _jax.device_put(tables, repl)
        table_masks = _jax.device_put(table_masks, repl)
        mesh_sh = frame_sharding(mesh)

    # batch across FRAMES: clusters per frame are few, so per-frame calls
    # would run the ViT mostly on padding
    todo: list[tuple[int, int]] = []
    for fnr in range(state.n_frames):
        sel = state.det_valid[fnr] if valid_only else state.det_n[fnr] > 0
        todo.extend((fnr, int(c)) for c in np.flatnonzero(sel)
                    if not (missing_only and state.det_cls[fnr, c] != CLS_NONE))
    ego = np.stack([state.transform_to_ego(f) for f in range(state.n_frames)])

    # dispatch every chunk first (async), stack the results on device,
    # and download ONCE — every host sync pays a ~30 ms tunnel round trip
    pending = []
    tail = min(batch, max(32, batch // 4))
    if mesh_sh is not None:
        # sharded batches split evenly across devices
        tail = max(n_dev, tail - tail % n_dev)
    i = 0
    while i < len(todo):
        # tail bucket: the final sliver runs at batch//4 instead of
        # paying a full-batch ViT pass that is mostly padding (at bench
        # scale the last call held 12/128 real items)
        b = batch if len(todo) - i > tail else tail
        chunk = todo[i:i + b]
        i += b
        fids = np.zeros(b, np.int32)
        cids = np.full(b, -1, np.int32)
        trs = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        for j, (f, c) in enumerate(chunk):
            fids[j], cids[j] = f, c
            trs[j] = ego[f]
        if mesh_sh is not None and b % n_dev == 0:
            fids = _jax.device_put(fids, mesh_sh)
            cids = _jax.device_put(cids, mesh_sh)
            trs = _jax.device_put(trs, mesh_sh)
        pending.append((chunk, classify(ng_xyz, tables, table_masks,
                                        fids, cids, trs)))
    if pending:
        import jax.numpy as jnp
        # rows concatenate (batches now vary in size); still ONE download
        packed = np.asarray(jnp.concatenate(
            [jnp.concatenate([idx.astype(jnp.float32), sc], axis=-1)
             for _, (idx, sc) in pending]))  # (sum_b, 2V)
        v = packed.shape[-1] // 2
        row0 = 0
        for chunk, (idx_dev, _) in pending:
            cls_idx = packed[row0: row0 + len(chunk), :v].astype(np.int32)
            scores = packed[row0: row0 + len(chunk), v:]
            row0 += idx_dev.shape[0]
            for j, (f, c) in enumerate(chunk):
                mapped = [mapping[class_list[k]] for k in cls_idx[j]]
                name, score = _vote(mapped, scores[j])
                state.det_cls[f, c] = MAPPED_CLASSES.index(name)
                state.det_score[f, c] = score
    if image_out_dir:
        dump_depth_images(state, cfg, image_out_dir, image_size=image_size)
    state.done["classification"] = True
