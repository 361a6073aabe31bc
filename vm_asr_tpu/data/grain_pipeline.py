"""grain-based input pipeline (alternative to the threaded DataPipeline).

Same contract as ``pipeline.DataPipeline`` — an epoch-aware iterable of
fixed-shape ``Batch``es — built on grain's multiprocess DataLoader. Use it
via ``DATA.PIPELINE: "grain"``; the default threaded pipeline stays the
baseline (grain's worker *processes* sidestep the GIL for the scipy/C++
degradation work and scale to multi-host input sharding via
``ShardOptions``, which a thread pool can't).

Randomness: grain derives a per-record rng from (seed, record position)
through its RandomMapTransform — deterministic for a given seed and epoch
like the threaded pipeline, though the two draw different streams (both
honour the reference's host-side-randomness design,
data_loaders.py:424-488).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np

from .pipeline import Batch, DegradingSampler

try:  # grain ships in the image; keep the module importable without it
    import grain.python as _grain
except ImportError:  # pragma: no cover
    _grain = None


def grain_available() -> bool:
    return _grain is not None


class _IndexSource:
    """Random-access source yielding corpus indices (the heavy work happens
    in the degrade transform, so records are just ints)."""

    def __init__(self, indices: Sequence[int]):
        self._indices = list(indices)

    def __len__(self) -> int:
        return len(self._indices)

    def __getitem__(self, i: int) -> int:
        return self._indices[i]


if _grain is not None:

    class _DegradeTransform(_grain.RandomMapTransform):
        """Corpus index → sample dict (picklable for grain workers)."""

        def __init__(self, sampler: DegradingSampler):
            self.sampler = sampler

        def random_map(self, index: int, rng: np.random.Generator) -> dict:
            x, y, highcut, name, pad = self.sampler.sample(int(index), rng)
            return {
                "wave_input": x[None, :],
                "wave_target": y[None, :],
                "highcut": np.int32(highcut),
                "name": name,
                "pad": np.int32(pad),
            }


class GrainPipeline:
    """Drop-in for DataPipeline backed by grain.DataLoader."""

    def __init__(self, sampler: DegradingSampler, batch_size: int,
                 indices: Optional[Sequence[int]] = None, shuffle: bool = True,
                 seed: int = 123, num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 2, shard_index: int = 0,
                 shard_count: int = 1):
        """shard_index/shard_count: multi-host input sharding (each host
        reads a disjoint 1/shard_count of every epoch — grain ShardOptions;
        pass ``jax.process_index()``/``jax.process_count()`` on real
        multi-host topologies). batch_size is the PER-HOST batch."""
        if _grain is None:
            raise RuntimeError("grain is not installed; use DataPipeline")
        if not 0 <= shard_index < shard_count:
            raise ValueError(f"shard_index {shard_index} not in "
                             f"[0, {shard_count})")
        self.sampler = sampler
        self.batch_size = batch_size
        self.indices = list(indices if indices is not None
                            else range(len(sampler.dataset)))
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._epoch = 0

    def __len__(self) -> int:
        # ShardOptions(drop_remainder=True) gives every shard exactly
        # n // shard_count records; batches count against the local share.
        n = len(self.indices) // self.shard_count
        b = self.batch_size
        return n // b if self.drop_last else -(-n // b)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __iter__(self) -> Iterator[Batch]:
        source = _IndexSource(self.indices)
        loader = _grain.DataLoader(
            data_source=source,
            sampler=_grain.IndexSampler(
                num_records=len(source),
                shuffle=self.shuffle,
                num_epochs=1,
                seed=(self.seed * 1_000_003 + self._epoch) % (2**31),
                # Disjoint per-host partition of the epoch; all hosts must
                # use the SAME seed so the global shuffle they partition is
                # identical (grain shards the shuffled order).
                shard_options=_grain.ShardOptions(
                    shard_index=self.shard_index,
                    shard_count=self.shard_count,
                    drop_remainder=True,
                ),
            ),
            operations=[_DegradeTransform(self.sampler)],
            worker_count=self.num_workers,
            worker_buffer_size=self.prefetch,
        )

        members: List[dict] = []
        yielded = 0
        target = len(self)
        it = iter(loader)
        try:
            for rec in it:
                members.append(rec)
                if len(members) == self.batch_size:
                    yield self._collate(members)
                    members = []
                    yielded += 1
                    if self.drop_last and yielded == target:
                        # Stop consuming: the (shuffled) tail records would
                        # only be degraded and discarded. Workers may have
                        # prefetched a handful — bounded waste, unlike a
                        # full extra pass.
                        break
            if members and not self.drop_last:
                yield self._collate(members)
        finally:
            # Breaking mid-stream abandons the iterator; its multiprocess
            # workers are otherwise only reclaimed at GC. Close it
            # deterministically so per-epoch loaders don't accumulate
            # worker processes over a long training.
            close = getattr(it, "close", None)
            if close is not None:
                close()
            del it

    @staticmethod
    def _collate(members: List[dict]) -> Batch:
        return Batch(
            wave_input=np.stack([m["wave_input"] for m in members]),
            wave_target=np.stack([m["wave_target"] for m in members]),
            highcut=np.asarray([m["highcut"] for m in members], np.int32),
            names=[m["name"] for m in members],
            pad_lengths=np.asarray([m["pad"] for m in members], np.int32),
        )
