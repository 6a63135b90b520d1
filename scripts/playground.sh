#!/usr/bin/env bash
# ETH3D train scene "playground" (reference scripts/playground.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/playground" "$@"
