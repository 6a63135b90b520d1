#!/usr/bin/env bash
# ETH3D train scene "courtyard" (reference scripts/courtyard.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/courtyard" "$@"
