#!/usr/bin/env bash
# ETH3D train scene "terrace" (reference scripts/terrace.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/terrace" "$@"
