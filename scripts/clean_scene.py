#!/usr/bin/env python
"""Scene-directory cleanup: delete intermediate artifacts, keep the
resume set.

Counterpart of the reference's data/TRAIN/delete.py / delete2.py
(SURVEY.md #29): those scripts prune each view's APD outputs down to the
keep-list that later stages consume (depths_geom.dmb, normals.dmb,
weak.png plus scene-level pair.txt and cams/). This version prunes both
the APD prior directories and our results/ directories down to the
per-view resume set (TSAR_disp.dmb, TSAR_normals.dmb, TSAR_model.ply).

Usage: scripts/clean_scene.py <scene_dir> [--dry-run] [--keep-vis]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

APD_KEEP = {"depths_geom.dmb", "normals.dmb", "weak.png", "depths.dmb"}
RESULT_KEEP = {"TSAR_disp.dmb", "TSAR_normals.dmb", "TSAR_model.ply",
               "TSAR_results.txt"}
VIS = {"TSAR_normals.png", "TSAR_disp.png", "TSAR_confidence.png",
       "TSAR_params.txt"}


def clean(scene: Path, dry_run: bool, keep_vis: bool) -> int:
    removed = 0
    keep_results = RESULT_KEEP | (VIS if keep_vis else set())
    for sub, keep in (("APD", APD_KEEP), ("results", keep_results)):
        base = scene / sub
        if not base.is_dir():
            continue
        for view_dir in sorted(p for p in base.iterdir() if p.is_dir()):
            for f in sorted(view_dir.iterdir()):
                if f.is_file() and f.name not in keep:
                    print(("would remove " if dry_run else "remove ")
                          + str(f))
                    if not dry_run:
                        f.unlink()
                    removed += 1
    return removed


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("scene_dir")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--keep-vis", action="store_true",
                   help="also keep the debug PNGs / parameter dump")
    ns = p.parse_args(argv)
    n = clean(Path(ns.scene_dir), ns.dry_run, ns.keep_vis)
    print(f"{'would remove' if ns.dry_run else 'removed'} {n} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
