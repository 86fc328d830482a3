"""Multi-host sequence striding (VERDICT r4 #8).

`run_sequences` stripes the sequence list ``names[pidx::pcnt]`` across
hosts (runner.py) — the DCN-axis distribution the reference lists as an
unreleased TODO (`/root/reference/README.md:30`; its CLI sequence loop,
`tools/preprocess_data.py:73-107`, is the parallelizable unit). A
one-line off-by-one there silently drops sequences in a real pod run, so
simulate hosts by monkeypatching ``jax.process_index/process_count`` and
assert every sequence is processed exactly once across the fleet, with
any host able to re-score the union from the shared result dir.
"""
import numpy as np
import pytest

from vilgod_tpu.config.presets import waymo_config
from vilgod_tpu.data import SyntheticDataset
from vilgod_tpu.pipeline import run_sequences

CAPS = {"max_points": 1024, "max_ng_points": 512, "max_clusters": 8,
        "max_cluster_points": 128, "max_tracks": 8, "max_cluster_input": 512,
        "clip_batch": 2}


def _dataset(n_seqs=5):
    return SyntheticDataset(n_sequences=n_seqs, n_frames=2, seed=21,
                            n_ground=150, n_vehicles=1, n_pedestrians=0,
                            n_moving=0)


@pytest.mark.parametrize("pcnt", [2, 3, 8])
def test_every_sequence_processed_exactly_once(tmp_path, monkeypatch, pcnt):
    # host-only stage list: the striding logic under test is pure Python,
    # so keep the per-sequence work trivial (no device programs)
    cfg = waymo_config(capacity=CAPS, pipeline_active=["evaluate_sequence"])
    ds = _dataset(5)
    result_dir = tmp_path / "results"

    import jax
    processed_by: dict[str, list[int]] = {}
    orig_eval = None

    for pidx in range(pcnt):
        monkeypatch.setattr(jax, "process_index", lambda p=pidx: p)
        monkeypatch.setattr(jax, "process_count", lambda: pcnt)
        before = {p.stem for p in result_dir.glob("*.npz")} if result_dir.exists() else set()
        run_sequences(ds, cfg, result_dir=result_dir, prefetch_next=False)
        after = {p.stem for p in result_dir.glob("*.npz")}
        for name in after - before:
            processed_by.setdefault(name, []).append(pidx)

    all_names = set(ds.sequence_names())
    assert set(processed_by) == all_names, (
        f"dropped: {all_names - set(processed_by)}")
    for name, hosts in processed_by.items():
        assert len(hosts) == 1, f"{name} processed by hosts {hosts}"
    # the striding is the canonical pidx::pcnt slice
    names = list(ds.sequence_names())
    for name, hosts in processed_by.items():
        assert names.index(name) % pcnt == hosts[0]


def test_union_rescore_from_shared_results(tmp_path, monkeypatch):
    """After a 3-host run, any single host re-running over the shared
    result dir reads every sequence from cache (no reprocessing) and
    gets the full union in dataset order."""
    cfg = waymo_config(capacity=CAPS, pipeline_active=["evaluate_sequence"])
    ds = _dataset(4)
    result_dir = tmp_path / "results"

    import jax
    pcnt = 3
    for pidx in range(pcnt):
        monkeypatch.setattr(jax, "process_index", lambda p=pidx: p)
        monkeypatch.setattr(jax, "process_count", lambda: pcnt)
        run_sequences(ds, cfg, result_dir=result_dir, prefetch_next=False)

    # single-host re-score: shard_hosts off; everything must come from cache
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 1)

    class NoBuild(SyntheticDataset):
        def sequence(self, name):  # pragma: no cover - must not be called
            raise AssertionError(f"{name} was reprocessed instead of cached")

    nb = NoBuild.__new__(NoBuild)
    nb.__dict__.update(ds.__dict__)
    union = run_sequences(nb, cfg, result_dir=result_dir, prefetch_next=False)
    total_frames = sum(ds.sequence(n).sequence_length
                       for n in ds.sequence_names())
    assert len(union) == total_frames
    for r in union:
        assert set(r) == {"boxes_lidar", "name", "score", "moving"}
