"""Grain-backed input pipeline: a drop-in alternative to data.pipeline.DataLoader.

The threaded loader (data/pipeline.py) is the default and plenty for the
reference-scale datasets; this wrapper exists for very large corpora where
decode/augment should scale across *processes* with deterministic,
checkpointable iteration — Google's grain provides the worker pool, per-record
RNG streams, and sharding, while batching/collation/padding stay identical to
the threaded loader so the train loops see the same batch dicts either way.

Usage (same surface as DataLoader):
    loader = GrainDataLoader(dataset, batch_size, shuffle=True, seed=16,
                             num_workers=8, collate=pair_collate)
    for epoch in range(E):
        loader.set_epoch(epoch)
        for batch in loader: ...
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import numpy as np

from change3d_tpu.data.pipeline import _default_collate


class _IndexSource:
    """Trivial random-access source over record indices; the actual IO and
    augmentation run inside the (worker-executed) random-map transform so a
    single source works for every dataset type."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return int(i)


class GrainDataLoader:
    """grain.python.DataLoader wrapper with the threaded loader's interface.

    dataset must expose __len__ and __getitem__(idx, rng) (the repo's dataset
    protocol). Batching is done here with the same collate functions and
    pad_final/'valid' semantics as data.pipeline.DataLoader.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 16,
        drop_last: Optional[bool] = None,
        num_workers: int = 4,
        pad_final: bool = False,
        collate: Optional[Callable] = None,
        prefetch: int = 4,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        if batch_size % max(num_shards, 1) != 0:
            raise ValueError(
                f"global batch_size {batch_size} must divide over {num_shards} processes"
            )
        # pad_final with num_shards > 1 (multi-host padded eval) is supported
        # via _sharded_padded_batches: grain's own interleaved ShardOptions
        # cannot express the global-position bookkeeping, so that path builds
        # the threaded loader's global batches itself (contiguous per-shard
        # slice + global 'valid' mask) and uses grain only as the worker pool
        # over this shard's index sequence.
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = shuffle if drop_last is None else drop_last
        self.num_workers = max(0, num_workers)
        self.pad_final = pad_final
        self.collate = collate or _default_collate
        self.prefetch = prefetch
        self.num_shards = max(num_shards, 1)
        self.shard_index = shard_index
        self.local_batch_size = batch_size // self.num_shards
        self._epoch = 0

    def __len__(self):
        if self.pad_final and self.num_shards > 1:
            # Global batches with a padded final one: every process sees the
            # same count regardless of how records interleave across shards.
            return -(-len(self.dataset) // self.batch_size)
        # Global batch count: each process draws local_batch_size records per
        # batch from its shard of ~n/num_shards records.
        n_local = len(self.dataset) // self.num_shards
        if self.drop_last and not self.pad_final:
            return n_local // self.local_batch_size
        return -(-n_local // self.local_batch_size)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _epoch_seed(self) -> int:
        # Per-epoch seed is a SeedSequence hash of (seed, epoch): epoch e of
        # seed s must NOT replay epoch e-1 of seed s+1 (which `seed + epoch`
        # would). The stream still differs from the threaded DataLoader's
        # (seed, epoch, batch, slot) tuple seeding — runs are reproducible
        # within a loader, not sample-for-sample identical across loaders.
        return int(np.random.SeedSequence([self.seed, self._epoch]).generate_state(1)[0])

    def _grain_iter(self):
        import grain.python as gp

        ds = self.dataset

        class Load(gp.RandomMapTransform):
            def random_map(self, idx, rng: np.random.Generator):
                return ds.__getitem__(int(idx), rng)

        epoch_seed = self._epoch_seed()
        shard_options = (
            gp.ShardOptions(
                shard_index=self.shard_index,
                shard_count=self.num_shards,
                drop_remainder=True,
            )
            if self.num_shards > 1
            else gp.NoSharding()
        )
        sampler = gp.IndexSampler(
            num_records=len(ds),
            shuffle=self.shuffle,
            seed=epoch_seed,
            num_epochs=1,
            shard_options=shard_options,
        )
        loader = gp.DataLoader(
            data_source=_IndexSource(len(ds)),
            sampler=sampler,
            operations=[Load()],
            worker_count=self.num_workers,
            worker_buffer_size=max(1, self.prefetch),
        )
        return iter(loader)

    def _finalize(self, samples, valid: int):
        batch = self.collate(samples)
        if self.pad_final:
            # 'valid' is attached to EVERY batch (same pytree structure across
            # the epoch — a jitted eval step must not retrace on the final
            # batch), exactly like the threaded DataLoader.
            batch = dict(batch) if isinstance(batch, dict) else batch
            batch["valid"] = np.arange(self.batch_size) < valid
        return batch

    def _sharded_padded_iter(self) -> Iterator:
        """Multi-host padded eval: every process computes the same global
        batches (order, final-batch padding with the last index), takes its
        contiguous [lo:hi) row slice, and attaches the global-position
        'valid' mask sliced to its rows — sample-for-sample the threaded
        DataLoader's sharded-eval contract (data/pipeline.py). grain serves
        only as the deterministic worker pool over this shard's flattened
        index sequence."""
        import grain.python as gp

        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self._epoch_seed()).shuffle(order)
        lo = self.shard_index * self.local_batch_size
        hi = lo + self.local_batch_size
        flat, valids = [], []
        for i in range(0, n, self.batch_size):
            idxs = order[i : i + self.batch_size]
            valid = len(idxs)
            if valid < self.batch_size:
                idxs = np.concatenate([idxs, np.full(self.batch_size - valid, idxs[-1])])
            flat.extend(int(x) for x in idxs[lo:hi])
            valids.append(valid)

        record_of_pos = flat
        ds = self.dataset

        class LoadAt(gp.RandomMapTransform):
            def random_map(self, pos, rng: np.random.Generator):
                return ds.__getitem__(record_of_pos[int(pos)], rng)

        sampler = gp.IndexSampler(
            num_records=len(flat),
            shuffle=False,
            seed=self._epoch_seed(),
            num_epochs=1,
            shard_options=gp.NoSharding(),
        )
        loader = gp.DataLoader(
            data_source=_IndexSource(len(flat)),
            sampler=sampler,
            operations=[LoadAt()],
            worker_count=self.num_workers,
            worker_buffer_size=max(1, self.prefetch),
        )
        samples, bi = [], 0
        for sample in loader:
            samples.append(sample)
            if len(samples) == self.local_batch_size:
                batch = self.collate(samples)
                batch = dict(batch) if isinstance(batch, dict) else batch
                batch["valid"] = (np.arange(self.batch_size) < valids[bi])[lo:hi]
                yield batch
                samples, bi = [], bi + 1

    def __iter__(self) -> Iterator:
        if self.pad_final and self.num_shards > 1:
            yield from self._sharded_padded_iter()
            return
        samples = []
        for sample in self._grain_iter():
            samples.append(sample)
            if len(samples) == self.local_batch_size:
                yield self._finalize(samples, self.local_batch_size)
                samples = []
        if not samples:
            return
        if self.pad_final:
            valid = len(samples)
            samples += [samples[-1]] * (self.batch_size - valid)
            yield self._finalize(samples, valid)
        elif not self.drop_last:
            yield self.collate(samples)
