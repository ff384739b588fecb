"""TrainingBundle: window-stacked multi-patch tensors (legacy builder).

Behavioral contract from /root/reference/frl/data/loaders/builders/
data_bundle.py (SURVEY.md §2.3 "legacy bundle builders" -- superseded by
FeatureBuilder in the reference but kept in its tree): stack several spatial
windows of a feature into one [Win, T, H, W, C] (channel-last here) tensor
with per-window masks and window metadata, for models that consume window
batches directly. The derived-channel half of the old builder lives in
:mod:`forest_tpu.data.derived_features`.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from forest_tpu.data.windows import SpatialWindow


@dataclass
class TrainingBundle:
    """A stack of windows of one feature + masks + provenance."""
    feature_name: str
    data: np.ndarray          # [Win, H, W, C] or [Win, T, H, W, C]
    mask: np.ndarray          # same shape, bool
    windows: List[SpatialWindow] = field(default_factory=list)

    @property
    def num_windows(self) -> int:
        return self.data.shape[0]

    @property
    def temporal(self) -> bool:
        return self.data.ndim == 5

    def window_meta(self) -> List[Dict[str, int]]:
        return [{"row_start": w.row_start, "col_start": w.col_start,
                 "height": w.height, "width": w.width}
                for w in self.windows]


def build_training_bundle(dataset, feature_builder, feature_name: str,
                          window_indices: Sequence[int]) -> TrainingBundle:
    """Stack ``dataset`` patches through the feature builder.

    ``dataset``: a ForestDatasetV2; ``window_indices`` index its current
    epoch patch list.
    """
    datas, masks, wins = [], [], []
    for i in window_indices:
        patch = dataset.get_patch(int(i))
        x, m = feature_builder.build_feature(feature_name, patch)
        datas.append(np.asarray(x))
        masks.append(np.asarray(m))
        wins.append(dataset.patches[dataset._current_indices[int(i)]])
    return TrainingBundle(feature_name, np.stack(datas), np.stack(masks),
                          wins)


__all__ = ["TrainingBundle", "build_training_bundle"]
