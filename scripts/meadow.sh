#!/usr/bin/env bash
# ETH3D train scene "meadow" (reference scripts/meadow.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/meadow" "$@"
