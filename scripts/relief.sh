#!/usr/bin/env bash
# ETH3D train scene "relief" (reference scripts/relief.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/relief" "$@"
