#!/usr/bin/env bash
# Per-scene matcher driver — the TPU-native counterpart of the
# reference's scripts/<scene>.sh (e.g. scripts/courtyard.sh:2-48): loops
# the per-view TSAR pipeline over every reference view of one scene with
# the scripts' operating point (scale=1, blocksize=11, iter=8,
# cost_gamma=10, cost_comb=best_n, n_best=1), then the whole scene can be
# fused with scripts/fuse_scene.sh.
#
# Usage: scripts/run_scene.sh <scene_dir> [extra tsar-scene flags...]
set -euo pipefail

scene_dir="${1:?usage: run_scene.sh <scene_dir> [flags...]}"
shift || true

scale=1
blocksize=11
iter=8

exec python -m tsar_mvs_tpu.cli scene "$scene_dir" \
    --cam_scale="$scale" --blocksize="$blocksize" --iterations="$iter" \
    "$@"
