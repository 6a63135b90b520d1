#!/usr/bin/env bash
# ETH3D train scene "terrains" (reference scripts/terrains.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/terrains" "$@"
