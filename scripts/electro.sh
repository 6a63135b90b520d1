#!/usr/bin/env bash
# ETH3D train scene "electro" (reference scripts/electro.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/electro" "$@"
