#!/usr/bin/env bash
# ETH3D train scene "office" (reference scripts/office.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/office" "$@"
