"""Deterministic checkerboard train/val/test split.

EXACT port of the reference arithmetic (must match bit-for-bit or every
downstream comparison drifts -- SURVEY.md §8.3):
/root/reference/frl/data/loaders/dataset/forest_dataset_v2.py:278-301.

Given a patch's top-left pixel (row_start, col_start), patch size P and a
split block size (bh, bw) in patches:
    patch_row = row_start // P ; patch_col = col_start // P
    block_row = patch_row // bh ; block_col = patch_col // bw
    A = (block_row // 2 + block_col // 2) % 2
    B = (block_row + block_col) % 4
    A==0 and B==0 -> test ; A==0 and B==2 -> val ; else -> train
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

SPLIT_TRAIN, SPLIT_VAL, SPLIT_TEST = 1, 2, 3
SPLIT_CODES = {"train": SPLIT_TRAIN, "val": SPLIT_VAL, "test": SPLIT_TEST}


def split_code(row_start, col_start, patch_size: int,
               block_size: Tuple[int, int] = (4, 4)):
    """Vectorized split code (1=train, 2=val, 3=test) for patch origins.

    ``row_start``/``col_start`` may be scalars or arrays (pixel coordinates of
    the patch top-left corner).
    """
    bh, bw = block_size
    patch_row = np.asarray(row_start) // patch_size
    patch_col = np.asarray(col_start) // patch_size
    block_row = patch_row // bh
    block_col = patch_col // bw
    a = (block_row // 2 + block_col // 2) % 2
    b = (block_row + block_col) % 4
    code = np.where((a == 0) & (b == 0), SPLIT_TEST,
                    np.where((a == 0) & (b == 2), SPLIT_VAL, SPLIT_TRAIN))
    return code if code.ndim else int(code)


def split_name(row_start: int, col_start: int, patch_size: int,
               block_size: Tuple[int, int] = (4, 4)) -> str:
    code = split_code(row_start, col_start, patch_size, block_size)
    return {SPLIT_TRAIN: "train", SPLIT_VAL: "val", SPLIT_TEST: "test"}[code]


def pixel_split_code(y, x, patch_size: int,
                     block_size: Tuple[int, int] = (4, 4)):
    """Split code for arbitrary pixel coordinates: the patch containing the
    pixel determines the split (used for per-pixel legacy sampling and
    embed_locations split labels)."""
    y0 = (np.asarray(y) // patch_size) * patch_size
    x0 = (np.asarray(x) // patch_size) * patch_size
    return split_code(y0, x0, patch_size, block_size)


__all__ = ["split_code", "split_name", "pixel_split_code", "SPLIT_CODES",
           "SPLIT_TRAIN", "SPLIT_VAL", "SPLIT_TEST"]
