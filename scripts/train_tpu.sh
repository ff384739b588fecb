#!/usr/bin/env bash
# TPU training launcher — the forest-tpu analogue of the reference's SLURM
# scripts (train_isaac*.sh, SURVEY.md §1 "Ops"): stage the cube to fast
# local storage, pin host BLAS threads, and launch with auto-resume so a
# preempted job continues from encoder_last on resubmit.
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

# Optional fast staging: FOREST_TPU_STAGE_DIR=/dev/shm scripts/train_tpu.sh ...
stage_cube() {
  local src=$1
  if [[ -n "${FOREST_TPU_STAGE_DIR:-}" && -d "$src" ]]; then
    local dst="${FOREST_TPU_STAGE_DIR}/$(basename "$src")"
    if [[ ! -d "$dst" ]]; then
      echo "staging $src -> $dst"
      cp -r "$src" "$dst"
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
