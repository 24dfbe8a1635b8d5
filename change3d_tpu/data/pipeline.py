"""Input pipeline: threaded decode/augment workers + device prefetch.

The reference leans on torch DataLoader worker processes
(ref: /root/reference/scripts/train_BCD.py:49-56). The TPU-native equivalent
keeps the accelerator fed by (a) overlapping host decode/augment with device
compute via a bounded queue of worker threads (cv2/numpy release the GIL for
the heavy parts), and (b) transferring batches to device asynchronously with
``jax.device_put`` against the target sharding, double-buffered so step N+1's
H2D copy rides under step N's compute.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax


def shard_batch(batch, sharding):
    """Transfer a host batch (pytree of np arrays) onto the mesh.

    Single-process: a plain device_put against the target sharding.
    Multi-process (``jax.process_count() > 1``): each process holds only its
    slice of the global batch (see DataLoader num_shards/shard_index), so the
    global array is assembled with ``jax.make_array_from_process_local_data``
    — each host contributes the rows its addressable devices own.
    """
    if sharding.is_fully_addressable:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


class DataLoader:
    """Deterministic, seedable batch loader with background workers.

    dataset must expose __len__ and __getitem__(idx, rng). Batches are stacked
    numpy pytrees; incomplete final batches are dropped in training (so jitted
    shapes stay static) and padded in eval (with a 'valid' mask so metrics can
    ignore padding on device).

    Multi-host: ``batch_size`` is always the GLOBAL batch size. With
    ``num_shards=jax.process_count(), shard_index=jax.process_index()`` every
    process computes the same global index order (the shuffle is a pure
    function of (seed, epoch)) but decodes only its contiguous
    ``batch_size // num_shards`` slice of each batch — no redundant IO — and
    yields that local slice; ``shard_batch`` reassembles the global array.
    The global batch composition is identical to a single-process run, so a
    2-process run computes bit-equal losses to a 1-process run of the same
    global batch (tested in tests/test_distributed.py).
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
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = shuffle if drop_last is None else drop_last
        if num_shards > 1 and not (self.drop_last or pad_final):
            # A short final batch would slice ragged across processes (empty
            # or unequal local row counts -> collate crash / mismatched
            # global-array shards); require one of the two shape-stable modes.
            raise ValueError(
                "sharded DataLoader needs drop_last=True or pad_final=True "
                "(a ragged final batch cannot be split across processes)"
            )
        self.num_workers = max(1, num_workers)
        self.pad_final = pad_final
        self.collate = collate or _default_collate
        self.prefetch = prefetch
        self.num_shards = max(num_shards, 1)
        self.shard_index = shard_index
        self.local_batch_size = batch_size // self.num_shards
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last and not self.pad_final:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        batches = []
        for i in range(0, n, self.batch_size):
            idxs = order[i : i + self.batch_size]
            if len(idxs) < self.batch_size:
                if self.drop_last and not self.pad_final:
                    break
                if self.pad_final:
                    pad = np.full(self.batch_size - len(idxs), idxs[-1])
                    batches.append((np.concatenate([idxs, pad]), len(idxs)))
                    continue
            batches.append((idxs, len(idxs)))
        return batches

    def __iter__(self) -> Iterator:
        return self.iter_from(0)

    def iter_from(self, skip_batches: int) -> Iterator:
        """Iterate starting at batch index ``skip_batches`` of this epoch —
        ZERO decode/augment cost for the skipped prefix (the batch index
        list is sliced before any work is submitted). Batch rng seeds use
        the GLOBAL batch index, so batch k of a resumed epoch is
        sample-for-sample and augmentation-for-augmentation identical to
        batch k of an uninterrupted run (the mid-epoch resume path,
        train/loop.py)."""
        # Every process computes the same global batches, then takes its
        # contiguous slice; rows are rng-seeded by GLOBAL slot so a sharded
        # run's global batch is sample-for-sample the single-process batch.
        lo = self.shard_index * self.local_batch_size
        hi = lo + self.local_batch_size
        batches = [(idxs[lo:hi], valid) for idxs, valid in self._index_batches()]
        if skip_batches:
            if skip_batches >= len(batches):
                raise RuntimeError(
                    f"resume checkpoint is ahead of the dataset: cannot skip "
                    f"{skip_batches} of {len(batches)} batches (did the train "
                    f"split shrink since the preemption save?)"
                )
            batches = batches[skip_batches:]
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_sample(bi, j, idx):
            # Seeded per-sample rng: augmentation is reproducible regardless of
            # worker scheduling (and of process sharding: j is the global slot).
            rng = np.random.default_rng((self.seed, self._epoch, bi, j))
            return self.dataset.__getitem__(int(idx), rng)

        def offer(item) -> bool:
            """Blocking put that aborts when the consumer goes away."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            from concurrent.futures import ThreadPoolExecutor

            try:
                # Fan decode/augment over num_workers threads (cv2/numpy/h5py
                # release the GIL for the heavy parts); keep a 2-batch window
                # of in-flight sample futures so assembly overlaps decode.
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    window: "deque" = deque()
                    # start= keeps bi the GLOBAL batch index after a resume
                    # skip, so per-sample rng seeds (seed, epoch, bi, slot)
                    # match the uninterrupted run's.
                    it = iter(enumerate(batches, start=skip_batches))

                    def submit():
                        nxt = next(it, None)
                        if nxt is not None:
                            bi, (idxs, valid) = nxt
                            futs = [
                                pool.submit(load_sample, bi, lo + j, idx)
                                for j, idx in enumerate(idxs)
                            ]
                            window.append((futs, valid))

                    submit()
                    submit()
                    while window and not stop.is_set():
                        futs, valid = window.popleft()
                        samples = [f.result() for f in futs]
                        submit()
                        batch = self.collate(samples)
                        if self.pad_final:
                            batch = dict(batch) if isinstance(batch, dict) else batch
                            # 'valid' is a global-position mask sliced to this
                            # process's rows.
                            batch["valid"] = (np.arange(self.batch_size) < valid)[lo:hi]
                        if not offer(batch):
                            return
            except Exception as e:  # propagate to consumer
                offer(e)
            finally:
                offer(None)

        worker = threading.Thread(target=produce, daemon=True)
        worker.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def iter_from(loader, skip_batches: int):
    """Iterate ``loader`` starting at batch ``skip_batches`` (mid-epoch
    resume). Zero-cost when the loader supports it (threaded DataLoader's
    ``iter_from`` slices the index list before any decode); otherwise falls
    back to draining the prefix, with a clear error instead of a bare
    StopIteration when the checkpoint is ahead of the dataset."""
    if skip_batches <= 0:
        return iter(loader)
    if hasattr(loader, "iter_from"):
        return loader.iter_from(skip_batches)
    it = iter(loader)
    for k in range(skip_batches):
        try:
            next(it)
        except StopIteration:
            raise RuntimeError(
                f"resume checkpoint is ahead of the dataset: cannot skip "
                f"{skip_batches} batches, epoch ended after {k} (did the "
                f"train split shrink since the preemption save?)"
            ) from None
    return it


def make_data_loader(kind: str, dataset, batch_size: int, **kwargs):
    """Loader factory: ``kind`` is 'threaded' (this module's DataLoader) or
    'grain' (grain.python process-pool workers; see data/grain_pipeline.py).
    Both expose the same surface (len / set_epoch / iteration, identical batch
    pytrees) so train loops are loader-agnostic. Sample order and augmentation
    streams are reproducible per loader but not identical across the two.

    Under ``jax.process_count() > 1`` the loader is automatically sharded by
    process (pass num_shards/shard_index explicitly to override): each host
    decodes only its slice of every global batch.
    """
    if "num_shards" not in kwargs and jax.process_count() > 1:
        kwargs["num_shards"] = jax.process_count()
        kwargs["shard_index"] = jax.process_index()
    if kind == "grain":
        from change3d_tpu.data.grain_pipeline import GrainDataLoader

        return GrainDataLoader(dataset, batch_size, **kwargs)
    if kind != "threaded":
        raise ValueError(f"unknown loader kind: {kind!r} (expected 'threaded' or 'grain')")
    return DataLoader(dataset, batch_size, **kwargs)


def _default_collate(samples: Sequence):
    first = samples[0]
    if isinstance(first, dict):
        return {k: np.stack([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return tuple(np.stack([s[i] for s in samples]) for i in range(len(first)))
    return np.stack(samples)


def pair_collate(samples):
    """(image [H,W,6], label [H,W,C]) -> dict with pre/post split out."""
    imgs = np.stack([s[0] for s in samples])
    labels = np.stack([s[1] for s in samples])
    return {
        "pre": np.ascontiguousarray(imgs[..., 0:3]),
        "post": np.ascontiguousarray(imgs[..., 3:6]),
        "label": labels,
    }


def caption_collate(samples):
    out = {k: np.stack([s[k] for s in samples]) for k in ("pre", "post", "caption")}
    out["length"] = np.asarray([s["length"] for s in samples], np.int32)
    if "all_captions" in samples[0]:
        out["all_captions"] = np.stack([s["all_captions"] for s in samples])
    return out


def device_prefetch(iterator, sharding, depth: int = 2):
    """Move batches to device ahead of consumption (double buffering)."""
    import collections

    buf = collections.deque()
    it = iter(iterator)
    try:
        while len(buf) < depth:
            buf.append(shard_batch(next(it), sharding))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(shard_batch(next(it), sharding))
        except StopIteration:
            pass
        yield out
