#!/usr/bin/env bash
# TPU training launcher — the forest-tpu analogue of the reference's SLURM
# scripts (train_isaac*.sh, SURVEY.md §1 "Ops"): pin host BLAS threads and
# launch with auto-resume so a preempted job continues from the last
# checkpoint on resubmit. In vq mode, FOREST_TPU_STAGE_DIR stages the cube
# to fast local storage first (frl mode reads the cube path from the
# bindings YAML, so stage it yourself and point the bindings at the copy).
#
# Usage:
#   scripts/train_tpu.sh frl  BINDINGS.yaml TRAINING.yaml [extra args...]
#   scripts/train_tpu.sh vq   CONFIG.yaml ZARR RUN_DIR   [extra args...]
set -euo pipefail

MODE=${1:?mode: frl|vq}
shift

# Keep host-side BLAS single-threaded: decode threads + XLA own the cores
# (the reference pins torch/BLAS the same way, train_representation.py:61-71).
export OPENBLAS_NUM_THREADS=1 OMP_NUM_THREADS=1 MKL_NUM_THREADS=1

# Optional fast staging (vq mode): FOREST_TPU_STAGE_DIR=/dev/shm ...
# Atomic: copy to a temp dir then mv, so a preempted copy is never reused
# as a (silently truncated) cube; progress goes to stderr (stdout is the
# captured path).
stage_cube() {
  local src=$1
  if [[ -n "${FOREST_TPU_STAGE_DIR:-}" && -d "$src" ]]; then
    local dst="${FOREST_TPU_STAGE_DIR}/$(basename "$src")"
    if [[ ! -d "$dst" ]]; then
      echo "staging $src -> $dst" >&2
      local tmp="${dst}.tmp.$$"
      rm -rf "$tmp"
      cp -r "$src" "$tmp"
      mv "$tmp" "$dst"
    fi
    echo "$dst"
  else
    echo "$src"
  fi
}

case "$MODE" in
  frl)
    BINDINGS=${1:?bindings yaml}; TRAINING=${2:?training yaml}; shift 2
    exec python -m forest_tpu.training.train_representation \
      --training "$TRAINING" --bindings "$BINDINGS" "$@"
    ;;
  vq)
    CONFIG=${1:?config yaml}; ZARR=${2:?zarr path}; RUN=${3:?run dir}
    shift 3
    ZARR=$(stage_cube "$ZARR")
    exec python -m forest_tpu.training.train_vqvae \
      --config "$CONFIG" --zarr "$ZARR" --run-dir "$RUN" "$@"
    ;;
  *)
    echo "unknown mode: $MODE (frl|vq)" >&2; exit 2
    ;;
esac
