#!/usr/bin/env bash
# ETH3D train scene "kicker" (reference scripts/kicker.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/kicker" "$@"
