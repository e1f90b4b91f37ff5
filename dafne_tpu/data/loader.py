"""Samplers and the prefetching host data loader.

Replaces the reference's torch DataLoader + Detectron2 samplers
(build_detection_train_loader in tools/plain_train_net.py:219-277):

- TrainingSampler: infinite stream of shuffled epoch permutations
- RepeatFactorTrainingSampler: class-rebalanced repetition
  (DATALOADER.REPEAT_THRESHOLD; factor = max_c sqrt(t / f_c), stochastic
  rounding per epoch — Detectron2 semantics)
- Loader: thread-pool mapping (cv2 releases the GIL for decode/warp) with a
  bounded prefetch queue; yields dicts of stacked numpy arrays, ready for
  `jax.device_put` with a batch sharding.
"""

from __future__ import annotations

import itertools
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np
from concurrent.futures import ThreadPoolExecutor

from dafne_tpu.data.mapper import DatasetMapper, pad_target_hw


def training_sampler(n: int, seed: int = 0) -> Iterator[int]:
    rng = np.random.RandomState(seed)
    while True:
        for i in rng.permutation(n):
            yield int(i)


def repeat_factors(records: List[dict], threshold: float) -> np.ndarray:
    """Per-image repeat factor: max over its categories of sqrt(t / freq)."""
    n = len(records)
    freq: Dict[int, float] = {}
    for r in records:
        for cat in {a["category_id"] for a in r.get("annotations", [])}:
            freq[cat] = freq.get(cat, 0) + 1
    for k in freq:
        freq[k] /= n
    factors = np.ones(n)
    for i, r in enumerate(records):
        cats = {a["category_id"] for a in r.get("annotations", [])}
        if cats:
            factors[i] = max(
                max(1.0, np.sqrt(threshold / freq[c])) for c in cats
            )
    return factors


def repeat_factor_sampler(
    records: List[dict], threshold: float, seed: int = 0
) -> Iterator[int]:
    factors = repeat_factors(records, threshold)
    floors = np.floor(factors).astype(np.int64)
    frac = factors - floors
    rng = np.random.RandomState(seed)
    while True:
        counts = floors + (rng.rand(len(records)) < frac)
        epoch = np.repeat(np.arange(len(records)), counts)
        rng.shuffle(epoch)
        for i in epoch:
            yield int(i)


def build_sampler(cfg, records: List[dict], seed: int = 0) -> Iterator[int]:
    if cfg.DATALOADER.SAMPLER_TRAIN == "RepeatFactorTrainingSampler":
        return repeat_factor_sampler(records, cfg.DATALOADER.REPEAT_THRESHOLD, seed)
    return training_sampler(len(records), seed)


class DataLoader:
    """Bounded-prefetch batch loader over a record list."""

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
        buckets=None,
        device_aug: bool = False,
    ):
        """batch_size is the GLOBAL batch; with process_count > 1 each
        process maps/yields only its contiguous row slice (same sampler
        stream on every process — identical seed — so the union of slices
        is exactly the single-process global batch).  Host-only metadata
        (image_id, batch_valid) stays GLOBAL so the rank-0 evaluator can
        consume replicated decode outputs.

        ``buckets``: optional mapper.TrainScaleBuckets — bucketed multi-scale
        training (TPU.BUCKETED_TRAIN).  One shortest-edge scale is drawn per
        GLOBAL batch from a dedicated seed-derived stream (identical on every
        process) and the batch renders onto that scale's ladder canvas, so
        batch image shapes vary across steps but stay static per bucket."""
        self.records = records
        self.batch_size = batch_size
        assert batch_size % max(process_count, 1) == 0, (batch_size, process_count)
        self.proc_lo = (batch_size // process_count) * process_index
        self.proc_hi = self.proc_lo + batch_size // process_count
        self.train = train
        self.mapper = DatasetMapper(cfg, train, pad_hw or pad_target_hw(cfg, train))
        self.num_workers = (
            cfg.DATALOADER.NUM_WORKERS if num_workers is None else num_workers
        )
        self.prefetch = max(1, cfg.TPU.PREFETCH_DEPTH)
        self.seed = seed
        self.buckets = buckets if train else None
        # one long-lived pool: a fresh ThreadPoolExecutor per batch costs
        # thread spawn/join on the hot producer path every step
        self._executor = (
            ThreadPoolExecutor(self.num_workers) if self.num_workers > 0 else None
        )
        if train:
            if cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS:
                filtered = [r for r in records if r.get("annotations")]
                self.records = filtered or records
            self.sampler = build_sampler(cfg, self.records, seed)
        else:
            self.sampler = None
        # TPU.TRAIN_DEVICE_AUG: ship the raw base image + tiny warp/color
        # vectors, the train step renders the augmented canvas on device
        self.device_aug = bool(device_aug) and train
        self.base_hw = None
        if self.device_aug:
            from dafne_tpu.data.mapper import device_aug_base_hw

            self.base_hw = device_aug_base_hw(self.records)
            if self.base_hw is None:
                import logging

                logging.getLogger("dafne_tpu").warning(
                    "TPU.TRAIN_DEVICE_AUG: records lack width/height — "
                    "falling back to host-side augmentation"
                )
                self.device_aug = False
            else:
                self.mapper = DatasetMapper(
                    cfg, train, pad_hw or pad_target_hw(cfg, train),
                    device_aug=True,
                )

    def _make_batch(
        self, indices: List[int], seeds: List[int],
        min_size: Optional[int] = None, pad_hw=None,
    ) -> Dict[str, np.ndarray]:
        # images render straight into the batch buffer: no per-example canvas
        # allocation and no np.stack copy (3 MB/img at 1024^2 — the host here
        # has ONE core, so every avoided memcpy is throughput)
        pad_h, pad_w = pad_hw or (self.mapper.pad_h, self.mapper.pad_w)
        if self.device_aug:  # the buffer holds BASE images; the device warps
            img_key = "image_base"
            imgs = np.zeros((len(indices), *self.base_hw, 3), np.uint8)
        else:
            img_key = "image"
            imgs = np.zeros((len(indices), pad_h, pad_w, 3), np.uint8)

        def one(args):
            slot, i, s = args
            return self.mapper(
                self.records[i], np.random.RandomState(s), image_out=imgs[slot],
                min_size=min_size, pad_hw=(pad_h, pad_w),
            )

        work = list(zip(range(len(indices)), indices, seeds))
        if self.num_workers > 0 and len(indices) > 1:
            examples = list(self._executor.map(one, work))
        else:
            examples = [one(a) for a in work]
        batch: Dict[str, np.ndarray] = {img_key: imgs}
        for k in examples[0]:
            if k == img_key:
                continue
            if k == "image_id":
                batch[k] = [e[k] for e in examples]
            else:
                batch[k] = np.stack([e[k] for e in examples])
        return batch

    def __iter__(self):
        if self.train:
            return self._train_iter()
        return self._eval_iter()

    def _train_iter(self):
        seed_counter = itertools.count(self.seed * 1_000_003 + 1)
        # per-batch scale draws (bucketed ms train): own stream, same seed on
        # every process, so all processes agree on each batch's canvas
        scale_rng = np.random.RandomState(self.seed * 7919 + 13)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            while not stop.is_set():
                # draw the GLOBAL batch stream (identical on all processes),
                # map only this process's slice
                idx = [next(self.sampler) for _ in range(self.batch_size)]
                seeds = [next(seed_counter) % (2 ** 31) for _ in idx]
                min_size = pad_hw = None
                if self.buckets is not None:
                    min_size, pad_hw = self.buckets.draw(scale_rng)
                q.put(
                    self._make_batch(
                        idx[self.proc_lo : self.proc_hi],
                        seeds[self.proc_lo : self.proc_hi],
                        min_size=min_size, pad_hw=pad_hw,
                    )
                )

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        empty_exc = queue.Empty  # bind now: module globals may be torn down
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
            try:  # unblock the producer if it is waiting on a full queue
                while True:
                    q.get_nowait()
            except empty_exc:
                pass

    def _eval_iter(self):
        n = len(self.records)
        for start in range(0, n, self.batch_size):
            idx = list(range(start, min(start + self.batch_size, n)))
            real = len(idx)
            while len(idx) < self.batch_size:  # pad the last batch
                idx.append(idx[-1])
            batch = self._make_batch(
                idx[self.proc_lo : self.proc_hi],
                [0] * (self.proc_hi - self.proc_lo),
            )
            # global host-side metadata for the rank-0 evaluator
            batch["image_id"] = [
                self.records[i].get("image_id", str(i)) for i in idx
            ]
            batch["batch_valid"] = np.arange(self.batch_size) < real
            yield batch

    def __len__(self):
        if self.train:
            raise TypeError("train loader is infinite")
        return -(-len(self.records) // self.batch_size)
