#!/usr/bin/env python
"""Full-pipeline validation on full-resolution synthetic scenes.

No real ETH3D/Middlebury data exists in this environment (zero egress),
so this is the committed quality proxy for the north star ("output
should match the middlebury benchmark submission",
/root/reference/README.md:71; BASELINE.json F1@2cm): each scene runs
end-to-end — process_scene (PatchMatch + TSAR refinement per view) then
fuse_scene — and the fused cloud scores against the GT cloud with the
ETH3D F-score protocol (eval.py). Writes RESULTS.md at the repo root.

Scene specs (--scenes, comma list of name=kind:seed[:jitter]):
    planar:0        the bench scene (planar weak regions, seed 0)
    planar:1:1.0    jittered geometry, different texture seed
    curved:0        cylinder-section weak region — a single RANSAC
                    plane is wrong by construction (WMF must carry)

Usage: python scripts/validate_synthetic.py
       [--height 1344 --width 2048 --views 8]
       [--scenes planar:0,planar:1:1.0,curved:0]
       [--root /tmp/tsar_validate] (re-runs resume per view)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def gt_cloud(scene, stride: int = 4):
    """GT point cloud: backproject every view's GT depth (strided)."""
    import numpy as np
    V, H, W = scene.depth.shape
    Kinv = np.linalg.inv(scene.K)
    pts = []
    for v in range(V):
        d = scene.depth[v][::stride, ::stride]
        ok = np.isfinite(d)
        yy, xx = np.nonzero(ok)
        z = d[yy, xx]
        p = np.stack([xx * stride, yy * stride, np.ones_like(xx)], 0)
        cam = (Kinv @ p) * z
        world = scene.R[v].T @ (cam - scene.t[v][:, None])
        pts.append(world.T)
    return np.concatenate(pts)


def parse_spec(spec: str):
    parts = spec.split(":")
    kind = parts[0]
    seed = int(parts[1]) if len(parts) > 1 else 0
    jitter = float(parts[2]) if len(parts) > 2 else 0.0
    assert kind in ("planar", "curved"), kind
    return kind, seed, jitter


def run_scene(ns, spec: str):
    import jax
    import numpy as np

    from tsar_mvs_tpu import eval as ev
    from tsar_mvs_tpu import pipeline
    from tsar_mvs_tpu.config import AlgorithmParams, FusionParams
    from tsar_mvs_tpu.utils import dmb, ply
    from tsar_mvs_tpu.utils.synthetic import make_scene, source_coverage

    kind, seed, jitter = parse_spec(spec)
    tag = spec.replace(":", "_").replace(".", "p")
    t_all = time.time()
    scene_gt = make_scene(height=ns.height, width=ns.width,
                          num_views=ns.views, seed=seed,
                          curved_weak=(kind == "curved"),
                          geometry_jitter=jitter)
    root = Path(ns.root) if len(ns.scene_list) == 1 \
        else Path(ns.root) / tag
    if not (root / "pair.txt").exists():
        scene_gt.export(root)
        print(f"# scene {spec} exported to {root}", file=sys.stderr)

    bc = {}
    if ns.border_check:
        bc['border_check'] = True
    if ns.no_border_check:
        bc['border_check'] = False
    # Default: the config default (border_check=True since round 5's
    # default-on divergence) — the validate surface must match the
    # product surface.
    params = AlgorithmParams(iterations=ns.iterations,
                             max_views=ns.max_views, **bc)
    only = {int(v) for v in ns.only_views.split(",") if v != ""}

    view_times = []
    scene = pipeline.load_scene(root)
    for ref in range(ns.views):
        name = scene.names[ref]
        done = root / "results" / name / "TSAR_disp.dmb"
        if (only and ref not in only) or done.exists():
            view_times.append(None)
            print(f"# {spec} view {ref}: resume (exists)", file=sys.stderr)
            continue
        t0 = time.time()
        pipeline.process_view(scene, ref, params,
                              key=jax.random.PRNGKey(ref))
        view_times.append(time.time() - t0)
        print(f"# {spec} view {ref}: {view_times[-1]:.1f}s",
              file=sys.stderr)

    t0 = time.time()
    fused = pipeline.fuse_scene(root, FusionParams())
    fuse_s = time.time() - t0
    pts, _, _ = ply.read_ply(fused)
    pts = pts[np.isfinite(pts).all(1) & (np.abs(pts) > 1e-9).any(1)]

    gt_pts = gt_cloud(scene_gt)
    fs = ev.point_cloud_fscore(pts, gt_pts, threshold=0.02)

    # Per-view depth metrics vs GT (final outputs).
    rows = []
    for ref in range(ns.views):
        name = scene.names[ref]
        depth = dmb.read_dmb(root / "results" / name / "TSAR_disp.dmb")
        gt = scene_gt.depth[ref]
        ok = np.isfinite(gt)
        weak = scene_gt.weak_mask[ref]
        cover = source_coverage(scene_gt, ref=ref,
                                src_views=tuple(j for j in range(ns.views)
                                                if j != ref))
        matchable = ok & ~weak & (cover >= 1)
        rel = np.abs(depth - gt) / np.where(ok, gt, 1.0)
        valid = depth > 0

        def acc(sel):
            s = sel & valid
            return float((rel[s] < 0.02).mean()) if s.any() else 0.0

        rows.append({
            "view": ref,
            "acc2_textured": round(acc(matchable), 4),
            "acc2_weak": round(acc(ok & weak), 4),
            "weak_med_rel": round(float(np.median(
                rel[ok & weak & valid])), 4) if (ok & weak & valid).any()
            else None,
            "completeness": round(float(valid[ok].mean()), 4),
            "time_s": (round(view_times[ref], 1)
                       if view_times[ref] else None),
        })

    total_s = time.time() - t_all
    return {
        "scene": spec,
        "point": f"{ns.height}x{ns.width}x{ns.iterations}it/"
                 f"{min(ns.max_views, ns.views - 1)}src",
        "fscore@2cm": round(fs.f1, 4),
        "precision": round(fs.precision, 4),
        "recall": round(fs.recall, 4),
        "fuse_s": round(fuse_s, 1),
        "total_s": round(total_s, 1),
        "views": rows,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1344)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--root", default="/tmp/tsar_validate")
    ap.add_argument("--iterations", type=int, default=8)
    ap.add_argument("--max_views", type=int, default=7)
    ap.add_argument("--out", default=str(REPO / "RESULTS.md"))
    ap.add_argument("--border_check", action="store_true",
                    help="force-enable the region border-consistency "
                         "veto (config.border_check default: ON)")
    ap.add_argument("--no_border_check", action="store_true",
                    help="force-disable the veto (reference-exact)")
    ap.add_argument("--only_views", default="",
                    help="comma list: process only these views "
                         "(others must already exist)")
    ap.add_argument("--scenes", default="planar:0",
                    help="comma list of kind:seed[:jitter] scene specs")
    ap.add_argument("--no_report", action="store_true",
                    help="print JSON only; do not rewrite RESULTS.md")
    ns = ap.parse_args()
    ns.scene_list = ns.scenes.split(",")

    from tsar_mvs_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()

    reports = []
    for spec in ns.scene_list:
        rep = run_scene(ns, spec)
        reports.append(rep)
        print(json.dumps(rep))
        sys.stdout.flush()

    if ns.no_report:
        return 0

    lines = [
        "# RESULTS — full-pipeline validation on synthetic proxy scenes",
        "",
        "No real ETH3D/Middlebury data is reachable from this "
        "environment (zero egress), so the committed quality numbers "
        "are full-resolution synthetic proxies: `process_scene` + "
        "`fuse_scene` end-to-end, fused cloud scored against the GT "
        "cloud with the ETH3D F-score protocol "
        "(`eval.point_cloud_fscore`). Regenerate with "
        "`python scripts/validate_synthetic.py --scenes "
        + ns.scenes + "`.",
        "",
        f"Operating point: **{reports[0]['point']}** "
        f"(reference scripts' full point: scripts/courtyard.sh:11-15 — "
        f"2K ETH3D, 8 iterations). Flags: "
        f"border_check="
        f"{'off' if ns.no_border_check else 'on (default)'}.",
        "",
        "Scenes: `planar:<seed>` = textured planes with a planar "
        "textureless patch (the bench geometry; a jitter suffix "
        "perturbs the geometry per seed); `curved:<seed>` = a "
        "textureless CYLINDER section, where region RANSAC's single "
        "plane is wrong by construction and the fine WMF must carry "
        "the fill.",
        "",
        "## Fused point cloud vs GT (per scene)",
        "",
        "| scene | F-score @ 2 cm | precision | recall | fusion (s) |",
        "|---|---|---|---|---|",
    ]
    for rep in reports:
        lines.append(f"| {rep['scene']} | **{rep['fscore@2cm']}** | "
                     f"{rep['precision']} | {rep['recall']} | "
                     f"{rep['fuse_s']} |")
    for rep in reports:
        lines += [
            "",
            f"## Per-view depth quality — scene {rep['scene']}",
            "",
            "acc<2% = fraction of valid pixels within 2% relative depth "
            "error; `weak` = inside the scene's textureless regions "
            "(the pixels TSAR exists to fix); completeness = valid/GT "
            "pixels.",
            "",
            "| view | acc<2% textured | acc<2% weak | weak median rel "
            "err | completeness | time (s) |",
            "|---|---|---|---|---|---|",
        ]
        for r in rep["views"]:
            lines.append(f"| {r['view']} | {r['acc2_textured']} | "
                         f"{r['acc2_weak']} | {r['weak_med_rel']} | "
                         f"{r['completeness']} | {r['time_s']} |")
        timed = [r for r in rep["views"] if r["time_s"]]
        if timed:
            mean_t = sum(r["time_s"] for r in timed) / len(timed)
            lines += ["",
                      f"Mean per-view wall-clock (timed views): "
                      f"**{mean_t:.1f} s** (reference: ~20 s/view on a "
                      f"GTX 980 at 2K x 7 src, README.md:37-41)."]
    Path(ns.out).write_text("\n".join(lines) + "\n")
    print(f"# wrote {ns.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
