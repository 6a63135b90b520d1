#!/usr/bin/env bash
# ETH3D train scene "delivery_area" (reference scripts/delivery_area.sh).
exec "$(dirname "$0")/run_scene.sh" "data/TRAIN/delivery_area" "$@"
