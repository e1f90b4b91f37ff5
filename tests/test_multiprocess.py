"""Multi-host execution tests (SURVEY.md §5.8, VERDICT round-1 item #3).

The heavyweight end-to-end check spawns a REAL 2-process jax.distributed
CPU cluster (gloo collectives) and runs the actual train CLI: per-process
data slices, one global SPMD step, rank-gated writers, cooperative orbax
checkpointing, replicated eval decode + rank-0 evaluator.

The lightweight checks cover the pure-python pieces (batch slicing,
loader process slices) without a cluster.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_loader_process_slices_partition_global_batch(tmp_path):
    """Union of per-process loader outputs == the single-process batch."""
    from dafne_tpu.config import get_cfg
    from dafne_tpu.data import register_all_datasets
    from dafne_tpu.data.datasets.synthetic import load_synthetic
    from dafne_tpu.data.loader import DataLoader

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    cfg.DATALOADER.NUM_WORKERS = 0
    register_all_datasets(cfg)
    records = load_synthetic("train", 6)

    def first_batch(pi, pc):
        dl = DataLoader(
            cfg, records, batch_size=4, train=True, seed=3,
            pad_hw=(128, 128), process_index=pi, process_count=pc,
        )
        it = iter(dl)
        b = next(it)
        it.close()
        return b

    whole = first_batch(0, 1)
    left = first_batch(0, 2)
    right = first_batch(1, 2)
    assert left["image"].shape[0] == 2 and right["image"].shape[0] == 2
    np.testing.assert_array_equal(
        np.concatenate([left["image"], right["image"]]), whole["image"]
    )
    np.testing.assert_array_equal(
        np.concatenate([left["gt_classes"], right["gt_classes"]]),
        whole["gt_classes"],
    )


def test_eval_loader_keeps_global_metadata():
    from dafne_tpu.config import get_cfg
    from dafne_tpu.data import register_all_datasets
    from dafne_tpu.data.datasets.synthetic import load_synthetic
    from dafne_tpu.data.loader import DataLoader

    cfg = get_cfg()
    cfg.merge_from_file("configs/synthetic/base.yaml")
    cfg.DATALOADER.NUM_WORKERS = 0
    register_all_datasets(cfg)
    records = load_synthetic("val", 5)

    dl = DataLoader(
        cfg, records, batch_size=4, train=False, pad_hw=(128, 128),
        process_index=1, process_count=2,
    )
    batches = list(dl)
    assert len(batches) == 2
    # local image rows, GLOBAL image_id/batch_valid
    assert batches[0]["image"].shape[0] == 2
    assert len(batches[0]["image_id"]) == 4
    assert batches[0]["batch_valid"].shape == (4,)
    assert batches[1]["batch_valid"].sum() == 1  # 5th image only


def test_local_batch_slice_contract():
    from dafne_tpu.parallel.distributed import local_batch_slice

    lo, hi = local_batch_slice(8)  # single-process: full range
    assert (lo, hi) == (0, 8)


@pytest.mark.drills
def test_multiprocess_cluster_end_to_end():
    """2-process CPU cluster through the real train CLI (slow, ~3-5 min)."""
    import __graft_entry__ as g

    g.dryrun_multiprocess(2, 2)


@pytest.mark.drills
def test_multiprocess_kill_resume():
    """Operational recovery drill (VERDICT r3 #5): SIGKILL a rank after the
    first cooperative Orbax checkpoint finalizes, restart with --resume,
    and assert the run continues from the checkpoint to completion without
    double-written metric rows (slow, ~5-8 min)."""
    import __graft_entry__ as g

    g.dryrun_multiprocess_kill_resume(2, 2)


@pytest.mark.drills
def test_multiprocess_elastic_resume():
    """Elastic world-size recovery: a 1-process x 4-device run's Orbax
    checkpoint resumes on a 2-process x 4-device gloo cluster (8-way data
    parallelism, double global batch) and continues the iteration/metric
    sequence without duplication."""
    import __graft_entry__ as g

    g.dryrun_multiprocess_elastic_resume()
