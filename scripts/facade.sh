#!/usr/bin/env bash
# ETH3D train scene "facade" (reference scripts/facade.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/facade" "$@"
