#!/usr/bin/env bash
# Scene fusion driver — the counterpart of the reference's x/<n>.sh
# fusibile invocations (x/1.sh:19-30), with the same operating point:
# depth_diff=0.01, normal threshold 15 deg, num_consistent=1,
# reproj_error=2 px, used_list=1.
#
# Usage: scripts/fuse_scene.sh <scene_dir> [extra tsar-fuse flags...]
set -euo pipefail

scene_dir="${1:?usage: fuse_scene.sh <scene_dir> [flags...]}"
shift || true

depth_diff=0.01
normal_thresh=15
num_consistent=1
reproj_error=2
used_list=1

exec python -m tsar_mvs_tpu.cli fuse "$scene_dir" \
    --depth_diff="$depth_diff" --angle="$normal_thresh" \
    --num_consistent="$num_consistent" --reproj_error="$reproj_error" \
    --used_list="$used_list" "$@"
