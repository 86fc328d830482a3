"""CLI tooling tests: the standalone re-scoring CLI over fabricated
fixtures, and the common-utils helpers against small oracles."""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from test_datasets import waymo_root  # fixture reuse  # noqa: F401


def _load_tool(name):
    path = Path(__file__).resolve().parent.parent / "tools" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_evaluate_cli_rescoring(waymo_root, tmp_path, capsys):  # noqa: F811
    # fabricate "perfect" per-sequence results matching the GT
    from vilgod_tpu.data import WaymoSequenceDataset
    ds = WaymoSequenceDataset(waymo_root, split="val")
    results_dir = tmp_path / "results"
    results_dir.mkdir()
    for name in ds.sequence_names():
        seq = ds.sequence(name)
        frames = []
        for f in range(seq.sequence_length):
            annos = seq.get_annos(f)
            frames.append({
                "boxes_lidar": annos["gt_boxes_lidar"].copy(),
                "name": annos["gt_names"].copy(),
                "score": np.full(len(annos["gt_names"]), 0.9),
                "moving": annos["moving"].copy(),
            })
        np.savez_compressed(results_dir / f"{name}.npz",
                            results=np.array(frames, dtype=object))

    evaluate = _load_tool("evaluate")
    evaluate.main(["--results", str(results_dir), "--data", str(waymo_root),
                   "--eval-range", "-50", "-50", "50", "50"])
    out = capsys.readouterr().out
    assert "Vehicle AP" in out and ": 1.0000" in out
    line = next(ln for ln in out.splitlines() if ln.startswith("Vehicle AP "))
    assert line.endswith("1.0000")


def test_common_utils_oracles(rng):
    from vilgod_tpu.utils import (angle_between_vectors, extract_groups,
                                  interpolate_bounding_boxes)

    # grouping: two disjoint row/column-connected components
    m = np.zeros((4, 5))
    m[0, 0] = m[2, 0] = m[2, 3] = 1     # connected via column 0 / row 2
    m[3, 4] = 1                          # isolated
    groups = extract_groups(m)
    assert sorted(len(g) for g in groups) == [1, 3]

    assert angle_between_vectors([1, 0], [0, 1]) == pytest.approx(90, abs=0.5)
    assert angle_between_vectors([1, 0], [1, 0]) == pytest.approx(0, abs=1.0)

    boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                      [4, 0, 0, 4, 2, 1.5, np.pi / 2]])
    out = interpolate_bounding_boxes(boxes, [0, 4], 5)
    assert out.shape == (5, 7)
    np.testing.assert_allclose(out[2, 0], 2.0)
    assert out[2, 6] == pytest.approx(np.pi / 4, abs=1e-6)


def test_run_cli_override_parsing():
    run = _load_tool("run")
    ov = run.parse_overrides(["a.b=3", "c=[1,2]", "d.e=text", "f=true"])
    assert ov == {"a": {"b": 3}, "c": [1, 2], "d": {"e": "text"}, "f": True}
    with pytest.raises(SystemExit):
        run.parse_overrides(["nokey"])
