#!/usr/bin/env python
"""CLI driver: zero-shot pseudo-labeling over a dataset.

TPU-native equivalent of `/root/reference/tools/preprocess_data.py`: a
config-driven sequence loop with per-sequence result caching and a final
Waymo-protocol evaluation. Hydra is replaced by the in-repo config system
(presets + YAML overlay + dotted CLI overrides); the pipeline/
pipeline_active contract is identical.

Usage:
  python tools/run.py preprocessor=waymo paths.data=/data/waymo \\
      pipeline_active='["mask_ground_points","calculate_entropy_scores",...]' \\
      start_sequence=0 end_sequence=2
  python tools/run.py preprocessor=synthetic          # smoke run, no data
  python tools/run.py config=my_overrides.yaml ...
"""
from __future__ import annotations

import ast
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_overrides(argv: list[str]) -> dict:
    """`a.b.c=value` dotted overrides; values parsed as Python literals
    when possible (lists, numbers, bools), else strings."""
    out: dict = {}
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"override must be key=value: {arg}")
        key, raw = arg.split("=", 1)
        if raw.lower() in ("true", "false"):
            val = raw.lower() == "true"
        elif raw.lower() in ("null", "none"):
            val = None
        else:
            try:
                val = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                val = raw
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def build_dataset(cfg, logger):
    name = cfg.get("preprocessor", {}).get("name", "synthetic")
    start = cfg.get("start_sequence")
    end = cfg.get("end_sequence")
    if name == "waymo" and cfg.get("paths", {}).get("data"):
        from vilgod_tpu.data import WaymoSequenceDataset
        return WaymoSequenceDataset(cfg["paths"]["data"],
                                    split=cfg.get("split", "val"),
                                    start_sequence=start, end_sequence=end)
    if name == "argoverse" and cfg.get("paths", {}).get("data"):
        from vilgod_tpu.data import ArgoverseSequenceDataset
        return ArgoverseSequenceDataset(cfg["paths"]["data"],
                                        split=cfg.get("split", "val"),
                                        start_sequence=start, end_sequence=end)
    logger.info("No dataset path configured -> synthetic smoke dataset")
    from vilgod_tpu.data import SyntheticDataset
    syn = cfg.get("synthetic", {})
    return SyntheticDataset(n_sequences=syn.get("n_sequences", 1),
                            n_frames=syn.get("n_frames", 16),
                            n_ground=syn.get("n_ground", 3000),
                            n_vehicles=syn.get("n_vehicles", 2),
                            n_pedestrians=syn.get("n_pedestrians", 1),
                            n_moving=syn.get("n_moving", 1),
                            seed=cfg.get("random_seed", 666))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = parse_overrides([a for a in argv if not a.startswith("--")])

    from vilgod_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    from vilgod_tpu.config.confdict import load_yaml, merge
    from vilgod_tpu.config.presets import argoverse_config, waymo_config
    from vilgod_tpu.utils import create_logger, set_random_seed

    preset = overrides.pop("preprocessor", None)
    if isinstance(preset, dict):
        preset = preset.get("name")
    cfg = argoverse_config() if preset == "argoverse" else waymo_config()
    if preset == "synthetic":
        cfg["preprocessor"]["name"] = "synthetic"
    yaml_path = overrides.pop("config", None)
    if yaml_path:
        cfg = merge(cfg, load_yaml(yaml_path))
    cfg = merge(cfg, overrides)

    logger = create_logger()
    set_random_seed(cfg.get("random_seed", 666))

    dataset = build_dataset(cfg, logger)

    clip_model = None
    if "classification" in cfg.get("pipeline_active", []):
        from vilgod_tpu.models.clip_wrapper import ClipWrapper
        paths = cfg.get("paths", {})
        clip_model = ClipWrapper(cfg["preprocessor"]["clip"],
                                 checkpoint_path=paths.get("clip_model"),
                                 bpe_path=paths.get("bpe_vocab"))
        if not (paths.get("clip_model") and Path(paths["clip_model"]).exists()):
            logger.warning("No CLIP checkpoint found - using random weights "
                           "(smoke mode); set paths.clip_model for real runs")

    logger.info("Pipeline: %s", " -> ".join(cfg.get("pipeline_active", [])))

    from vilgod_tpu.pipeline import run_sequences
    paths = cfg.get("paths", {})
    results = run_sequences(
        dataset, cfg, clip_model=clip_model,
        cache_dir=paths.get("sequence_data"),
        result_dir=paths.get("results"))
    logger.info("Collected %d frames of pseudo-labels (%d detections)",
                len(results), sum(len(r["boxes_lidar"]) for r in results))

    # final evaluation when the dataset carries ground truth
    if hasattr(dataset, "gt_annos") or hasattr(
            next(iter([dataset.sequence(n) for n in dataset.sequence_names()[:1]]),
                 None), "get_annos"):
        gt = []
        for name in dataset.sequence_names():
            seq = dataset.sequence(name)
            gt.extend(seq.get_annos(f) for f in range(seq.sequence_length))
        from vilgod_tpu.eval import evaluate_detections, print_eval_log
        eval_stage = next((p for p in cfg.get("pipeline", [])
                           if p["name"] == "evaluate_sequence"), {"args": {}})
        eval_args = eval_stage.get("args", {})
        ap = evaluate_detections(
            results, gt, class_names=tuple(cfg["preprocessor"]["class_names"]),
            eval_cfg=cfg.get("eval_cfg", {}),
            eval_range=tuple(eval_args.get("eval_range",
                                           (-50.0, -20.0, 50.0, 20.0))),
            moving=eval_args.get("moving", False),
            static=eval_args.get("static", False))
        print_eval_log(ap, logger)
        if paths.get("results"):
            out = Path(paths["results"]) / "ap_results.json"
            out.write_text(json.dumps({k: float(v) for k, v in ap.items()},
                                      indent=2))
            logger.info("AP results written to %s", out)
    return results


if __name__ == "__main__":
    main()
