"""Grain-backed input pipeline (multiprocess alternative to the thread loader).

The SURVEY design plan (§7) calls for a Grain host pipeline; this module
provides it behind the same batch-dict contract as `loader.DataLoader`, with
true multiprocess workers (no GIL) and grain's prefetching/sharding
machinery.  Select with DATALOADER.BACKEND = "grain" (default "threads").

The per-record work (decode, affine warp, corner sort, static padding) is
exactly `DatasetMapper`; grain supplies sampling (shuffled infinite stream
or one epoch), worker processes, and batching.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import grain.python as pg

from dafne_tpu.data.mapper import DatasetMapper, pad_target_hw
from dafne_tpu.data.loader import repeat_factors


class _RecordSource:
    """len/getitem view over the record list (picklable for workers)."""

    def __init__(self, records: List[dict]):
        self._records = records

    def __len__(self):
        return len(self._records)

    def __getitem__(self, i):
        return self._records[int(i)]


class _MapExample(pg.RandomMapTransform):
    def __init__(self, cfg_dict, train: bool, pad_hw):
        from dafne_tpu.config import CfgNode

        self._mapper = DatasetMapper(CfgNode(cfg_dict), train, pad_hw)

    def random_map(self, record, rng: np.random.Generator):
        seed = int(rng.integers(0, 2**31 - 1))
        return self._mapper(record, np.random.RandomState(seed))


class _Collate(pg.MapTransform):
    def map(self, examples):
        batch: Dict[str, object] = {}
        for k in examples[0]:
            if k == "image_id":
                batch[k] = [e[k] for e in examples]
            else:
                batch[k] = np.stack([e[k] for e in examples])
        return batch


class GrainDataLoader:
    """Same contract as loader.DataLoader: iterate batch dicts."""

    def __init__(
        self,
        cfg,
        records: List[dict],
        batch_size: int,
        train: bool,
        seed: int = 0,
        pad_hw=None,
        num_workers: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """batch_size is the GLOBAL batch.  With process_count > 1 grain
        shards the RECORD STREAM per process (like the reference's
        DistributedSampler) and each process batches batch_size/process_count
        rows — statistically equivalent to, but not row-identical with, the
        thread loader's slice-of-the-same-global-batch scheme."""
        self.batch_size = batch_size
        self.train = train
        if train and cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS:
            records = [r for r in records if r.get("annotations")] or records
        if train and cfg.DATALOADER.SAMPLER_TRAIN == "RepeatFactorTrainingSampler":
            # materialize expected repeats once (grain samples uniformly;
            # fractional parts are realized by duplicating indices)
            f = repeat_factors(records, cfg.DATALOADER.REPEAT_THRESHOLD)
            rng = np.random.RandomState(seed)
            counts = np.floor(f).astype(int) + (rng.rand(len(f)) < (f - np.floor(f)))
            records = [records[i] for i in np.repeat(np.arange(len(records)), counts)]
        self.records = records
        workers = cfg.DATALOADER.NUM_WORKERS if num_workers is None else num_workers

        if process_count > 1:
            assert train, "grain backend shards train only; eval uses threads"
            assert batch_size % process_count == 0
            shard = pg.ShardOptions(
                shard_index=process_index, shard_count=process_count,
                drop_remainder=True,
            )
            local_batch = batch_size // process_count
        else:
            shard = pg.NoSharding()
            local_batch = batch_size
        sampler = pg.IndexSampler(
            num_records=len(records),
            shuffle=train,
            seed=seed,
            shard_options=shard,
            num_epochs=None if train else 1,
        )
        self._loader = pg.DataLoader(
            data_source=_RecordSource(records),
            sampler=sampler,
            operations=[
                _MapExample(
                    cfg.to_dict(), train, pad_hw or pad_target_hw(cfg, train)
                ),
                pg.Batch(local_batch, drop_remainder=train),
            ],
            worker_count=workers,
        )

    def __iter__(self):
        if self.train:
            yield from self._loader
            return
        # eval: pad the final short batch like loader.DataLoader
        for batch in self._loader:
            n = len(batch["image"])
            if n < self.batch_size:
                pad = self.batch_size - n
                for k, v in batch.items():
                    if k == "image_id":
                        batch[k] = list(v) + [v[-1]] * pad
                    else:
                        batch[k] = np.concatenate(
                            [v, np.repeat(v[-1:], pad, axis=0)]
                        )
                batch["batch_valid"] = np.arange(self.batch_size) < n
            else:
                batch["batch_valid"] = np.ones(self.batch_size, bool)
            yield batch

    def __len__(self):
        if self.train:
            raise TypeError("train loader is infinite")
        return -(-len(self.records) // self.batch_size)


def build_data_loader(cfg, records, batch_size, train, **kw):
    """Backend dispatch: DATALOADER.BACKEND 'threads' (default) or 'grain'.

    Multi-process (jax.process_count() > 1) is wired automatically: each
    process loads only its slice of the global batch.  Grain eval falls
    back to the thread loader in that mode (global image_id bookkeeping).
    """
    import jax

    if "process_count" not in kw and jax.process_count() > 1:
        kw["process_index"] = jax.process_index()
        kw["process_count"] = jax.process_count()
    backend = cfg.DATALOADER.get("BACKEND", "threads")
    if backend == "grain" and kw.get("buckets") is not None:
        # bucketed ms train needs a per-BATCH scale draw; grain maps records
        # independently, so the thread loader serves bucketed runs
        import logging

        logging.getLogger("dafne_tpu").warning(
            "DATALOADER.BACKEND=grain does not support bucketed multi-scale "
            "train (TPU.BUCKETED_TRAIN); using the thread loader"
        )
        backend = "threads"
    if backend == "grain" and kw.get("device_aug"):
        # device-aug batches carry a base-image buffer sized from the record
        # list (loader.DataLoader feature); grain keeps host-side warps
        import logging

        logging.getLogger("dafne_tpu").warning(
            "DATALOADER.BACKEND=grain does not support TPU.TRAIN_DEVICE_AUG; "
            "using the thread loader"
        )
        backend = "threads"
    if backend == "grain" and not (not train and kw.get("process_count", 1) > 1):
        kw.pop("buckets", None)  # always None here; not a grain kwarg
        kw.pop("device_aug", None)
        return GrainDataLoader(cfg, records, batch_size, train, **kw)
    from dafne_tpu.data.loader import DataLoader

    return DataLoader(cfg, records, batch_size, train, **kw)
