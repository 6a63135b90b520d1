#!/usr/bin/env bash
# ETH3D train scene "relief_2" (reference scripts/relief_2.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/relief_2" "$@"
