"""Spatial and temporal windows.

Behavioral contract from /root/reference/frl/data/loaders/readers/windows.py
(SURVEY.md §2.3): SpatialWindow carries pixel slices + bounds with
intersection arithmetic; TemporalWindow maps calendar years to time indices.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class SpatialWindow:
    row_start: int
    row_stop: int
    col_start: int
    col_stop: int

    @property
    def height(self) -> int:
        return self.row_stop - self.row_start

    @property
    def width(self) -> int:
        return self.col_stop - self.col_start

    @property
    def row_slice(self) -> slice:
        return slice(self.row_start, self.row_stop)

    @property
    def col_slice(self) -> slice:
        return slice(self.col_start, self.col_stop)

    def intersection(self, other: "SpatialWindow"
                     ) -> Optional["SpatialWindow"]:
        r0 = max(self.row_start, other.row_start)
        r1 = min(self.row_stop, other.row_stop)
        c0 = max(self.col_start, other.col_start)
        c1 = min(self.col_stop, other.col_stop)
        if r0 >= r1 or c0 >= c1:
            return None
        return SpatialWindow(r0, r1, c0, c1)

    def contains(self, row: int, col: int) -> bool:
        return (self.row_start <= row < self.row_stop
                and self.col_start <= col < self.col_stop)


@dataclass(frozen=True)
class TemporalWindow:
    start_year: int
    end_year: int

    @property
    def num_years(self) -> int:
        return self.end_year - self.start_year + 1

    def year_to_index(self, year: int) -> int:
        return year - self.start_year

    def index_to_year(self, idx: int) -> int:
        return self.start_year + idx

    def clip_years(self, years) -> Tuple[int, int]:
        """Indices into ``years`` (sorted array) overlapping this window."""
        lo = 0
        while lo < len(years) and years[lo] < self.start_year:
            lo += 1
        hi = len(years)
        while hi > lo and years[hi - 1] > self.end_year:
            hi -= 1
        return lo, hi


__all__ = ["SpatialWindow", "TemporalWindow"]
