"""Batch iteration for padded static-shape training (replaces the torch
``DataLoader`` used by the reference, ``chemprop/data/dataloader.py:24-96``).

XLA-first batching policy: every batch is padded to bucketed (node, edge)
sizes and to a constant graph count, so one epoch touches only a handful of
compiled program shapes. An optional background thread overlaps host
featurization/collation with device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from chemprop_tpu.data.collate import (
    PadSpec,
    TrainingBatch,
    collate_batch,
    collate_multicomponent,
    pad_to_bucket,
)
from chemprop_tpu.data.datasets import MoleculeDataset
from chemprop_tpu.data.samplers import ClassBalanceSampler, SeededSampler


class DataLoader:
    def __init__(
        self,
        dataset: MoleculeDataset,
        batch_size: int = 64,
        shuffle: bool = False,
        seed: int | None = None,
        class_balance: bool = False,
        drop_last: bool = False,
        pad_spec: PadSpec | None = None,
        prefetch: int = 2,
        n_shards: int = 0,
    ):
        """``n_shards > 0`` emits stacked-shard batches (leading shard axis,
        one self-contained padded shard per chip) for the shard_map SPMD
        trainer; ``pad_spec`` is then interpreted per shard."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.pad_spec = pad_spec
        self.prefetch = prefetch
        self.n_shards = n_shards

        # oversized-molecule isolation REORDERS the emitted rows. For
        # training-time loaders (shuffle/class_balance) order is already
        # meaningless; for UNSHUFFLED loaders it is still enabled and
        # consumers restore dataset row order through :meth:`emitted_order`
        # — molecule-level for plain loaders (Trainer.predict), GROUPED
        # per-atom/bond-table reordering for MAB loaders
        # (MABTrainer._predict_with) — so one giant molecule no longer
        # demotes every co-batched small molecule to the composed message
        # path.
        self._reshuffles = bool(shuffle or class_balance)
        self._isolate_oversized = True
        if class_balance:
            self.sampler = ClassBalanceSampler(dataset.Y, seed, shuffle)
        elif shuffle:
            if seed is None:
                seed = 0
            self.sampler = SeededSampler(len(dataset), seed)
        else:
            self.sampler = range(len(dataset))

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def emitted_order(self):
        """Dataset indices of emitted samples in emission order, or None for
        loaders whose order may change between iterations (shuffle /
        class-balance). Consumers that concatenate per-batch outputs
        (``Trainer.predict``) invert this to restore dataset row order when
        oversized-molecule isolation reordered the batches."""
        if self._reshuffles:
            return None
        import numpy as np

        idxs = [i for batch in self._index_batches() for i in batch]
        return np.asarray(idxs, dtype=np.int64)

    def _make_batch(self, idxs: list[int]) -> TrainingBatch:
        from chemprop_tpu.data.collate import collate_mol_atom_bond_batch
        from chemprop_tpu.data.datasets import MABDatum

        data = [self.dataset[i] for i in idxs]
        if self.n_shards:
            from chemprop_tpu.data.collate import collate_sharded

            if data and isinstance(data[0], MABDatum):
                raise NotImplementedError("sharded MAB batches are not supported yet")
            return collate_sharded(data, self.n_shards, self.pad_spec)
        if data and isinstance(data[0], list):  # multicomponent rows
            pads = self.pad_spec
            if pads is None:
                n_comp = len(data[0])
                pads = [
                    PadSpec.for_graphs([row[c].mg for row in data], n_graphs=self.batch_size)
                    for c in range(n_comp)
                ]
            return collate_multicomponent(data, pads)
        pad = self.pad_spec
        if pad is None:
            pad = PadSpec.for_graphs([d.mg for d in data], n_graphs=self.batch_size)
        if data and isinstance(data[0], MABDatum):
            return collate_mol_atom_bond_batch(data, pad)
        return collate_batch(data, pad)

    def _oversized(self, i: int) -> bool:
        """Whether datum ``i``'s molecule exceeds the fused message kernel's
        widest safety window (ops/fused_message.py SPAN_LIMIT). One such
        molecule demotes its WHOLE batch to the composed ops (3-4x HBM), so
        oversized molecules are routed into their own batches and only those
        batches pay the fallback. Cheap host check (num_bonds, no
        featurization); molecule-backed datapoints only."""
        data = getattr(self.dataset, "data", None)
        if not data:
            return False
        mol = getattr(data[i], "mol", None)
        if mol is None:
            return False
        from chemprop_tpu.ops.fused_message import SPAN_LIMIT

        return 2 * mol.num_bonds > SPAN_LIMIT[max(SPAN_LIMIT)]

    def _index_batches(self) -> Iterator[list[int]]:
        batch: list[int] = []
        big: list[int] = []  # oversized molecules get their own batches
        for i in self.sampler:
            if self._isolate_oversized and self._oversized(i):
                big.append(i)
                if len(big) == self.batch_size:
                    yield big
                    big = []
                continue
            batch.append(i)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch
        if big and not self.drop_last:
            yield big

    def __iter__(self) -> Iterator[TrainingBatch]:
        if self.prefetch <= 0:
            for idxs in self._index_batches():
                yield self._make_batch(idxs)
            return
        # background-thread pipeline: host featurization/collation overlaps
        # with consumer (device) work
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()

        def producer():
            try:
                for idxs in self._index_batches():
                    q.put(self._make_batch(idxs))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def build_dataloader(
    dataset: MoleculeDataset,
    batch_size: int = 64,
    num_workers: int = 0,
    class_balance: bool = False,
    seed: int | None = None,
    shuffle: bool = True,
    **kwargs,
) -> DataLoader:
    """Reference-compatible loader builder (``chemprop/data/dataloader.py:24``);
    ``num_workers`` maps to dataset-level parallel featurization."""
    if num_workers:
        dataset.n_workers = num_workers
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        seed=seed,
        class_balance=class_balance,
        **kwargs,
    )
