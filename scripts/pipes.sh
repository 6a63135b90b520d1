#!/usr/bin/env bash
# ETH3D train scene "pipes" (reference scripts/pipes.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/pipes" "$@"
