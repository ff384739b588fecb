"""Chunk-locality batch sampling + reservoir sampling (host side).

- ChunkBatchSampler: every batch drawn from a single zarr (y, x) chunk to
  minimize random IO; shuffles chunk order and within-chunk order per epoch;
  optional within-chunk replacement for small tail chunks. Behavioral contract
  from /root/reference/utils/samplers.py:42-108 (SURVEY.md §2.3).
- For multi-host TPU training the same object supports deterministic
  round-robin chunk assignment (``num_shards``/``shard_id``): each host
  iterates a disjoint chunk subset -- the per-host locality scheme of
  SURVEY.md §6.8.
- ReservoirSampler: Algorithm-R streaming uniform sample
  (/root/reference/frl/utils/sampling.py:10-53), vectorized batch updates.
"""
from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np


class ChunkBatchSampler:
    def __init__(self, xy_by_chunk: Sequence[np.ndarray], batch_size: int,
                 drop_last: bool = False,
                 replacement_within_chunk: bool = False,
                 seed: Optional[int] = None,
                 num_shards: int = 1, shard_id: int = 0):
        self.xy_by_chunk = [np.asarray(a, dtype=np.int64) for a in xy_by_chunk]
        self.batch_size = int(batch_size)
        self.drop_last = bool(drop_last)
        self.replacement = bool(replacement_within_chunk)
        self.rng = np.random.default_rng(seed)
        self.chunk_sizes = [int(a.size) for a in self.xy_by_chunk]
        self.non_empty = [i for i, n in enumerate(self.chunk_sizes) if n > 0]
        # Disjoint per-host chunk assignment, SIZE-balanced (greedy
        # largest-first) so lockstep multi-host runs get near-equal batch
        # counts per shard instead of index round-robin luck.
        if num_shards > 1:
            order = sorted(self.non_empty,
                           key=lambda i: -self.chunk_sizes[i])
            loads = [0] * num_shards
            assign = [[] for _ in range(num_shards)]
            for i in order:
                s = loads.index(min(loads))
                assign[s].append(i)
                loads[s] += self.chunk_sizes[i]
            self.my_chunks = assign[shard_id]
        else:
            self.my_chunks = list(self.non_empty)
        self.total = sum(self.chunk_sizes[i] for i in self.my_chunks)

    def __len__(self) -> int:
        if self.drop_last:
            return sum(self.chunk_sizes[i] // self.batch_size
                       for i in self.my_chunks)
        return sum(-(-self.chunk_sizes[i] // self.batch_size)
                   for i in self.my_chunks)

    def __iter__(self) -> Iterator[np.ndarray]:
        order = list(self.my_chunks)
        self.rng.shuffle(order)
        for cid in order:
            idxs = self.xy_by_chunk[cid]
            if self.replacement and idxs.size < self.batch_size:
                perm = self.rng.choice(idxs, size=self.batch_size,
                                       replace=True)
            else:
                perm = self.rng.permutation(idxs)
            for s in range(0, perm.size, self.batch_size):
                b = perm[s:s + self.batch_size]
                if b.size < self.batch_size:
                    if self.drop_last:
                        continue
                    if self.replacement:
                        extra = self.rng.choice(idxs,
                                                self.batch_size - b.size,
                                                replace=True)
                        b = np.concatenate([b, extra])
                yield b


class ReservoirSampler:
    """Streaming uniform sample of ``capacity`` rows (Algorithm R)."""

    def __init__(self, capacity: int, seed: Optional[int] = None):
        self.capacity = int(capacity)
        self.rng = np.random.default_rng(seed)
        self.buffer: Optional[np.ndarray] = None
        self.n_seen = 0

    def add(self, rows: np.ndarray) -> None:
        rows = np.atleast_2d(np.asarray(rows))
        if self.buffer is None:
            self.buffer = np.empty((0, rows.shape[1]), dtype=rows.dtype)
        # Fill phase.
        free = self.capacity - len(self.buffer)
        if free > 0:
            take = rows[:free]
            self.buffer = np.concatenate([self.buffer, take], axis=0)
            self.n_seen += len(take)
            rows = rows[free:]
        if not len(rows):
            return
        # Vectorized replacement: item i (global index n_seen + i) replaces a
        # random slot with prob capacity / (n_seen + i + 1).
        idx_global = self.n_seen + np.arange(len(rows)) + 1
        j = (self.rng.random(len(rows)) * idx_global).astype(np.int64)
        keep = j < self.capacity
        # Later duplicates to the same slot overwrite earlier -- same
        # distribution as sequential Algorithm R.
        self.buffer[j[keep]] = rows[keep]
        self.n_seen += len(rows)

    def sample(self) -> np.ndarray:
        if self.buffer is None:
            return np.empty((0, 0))
        return self.buffer.copy()


__all__ = ["ChunkBatchSampler", "ReservoirSampler"]
