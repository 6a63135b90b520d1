"""Command-line interface.

Two surfaces:
* `tsar gipuma ...` — flag-compatible with the reference binary's CLI
  (getParametersFromCommandLine, main.cpp:708-1009) so the reference's
  scene scripts translate 1:1: positional image names, `-mslp_folder`,
  `-images_folder`, `-krt_file`, `-output_folder`, `--cam_scale=`,
  `--iterations=`, `--blocksize=`, `--cost_gamma=`, `--cost_comb=`,
  `--n_best=`, `--min_angle=`, `--max_angle=`, `-no_display`.
* `tsar scene/view/fuse/synth/bench` — idiomatic subcommands for whole
  scenes.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path


def _alg_params(ns) -> "AlgorithmParams":
    from tsar_mvs_tpu.config import AlgorithmParams
    kw = {}
    if getattr(ns, "blocksize", None):
        kw["box_hsize"] = kw["box_vsize"] = ns.blocksize
    for flag, field in (("iterations", "iterations"),
                        ("cost_gamma", "gamma"), ("n_best", "n_best"),
                        ("cam_scale", "cam_scale"),
                        ("min_angle", "min_angle"),
                        ("max_angle", "max_angle"),
                        ("max_disparity", "max_disparity"),
                        ("max_views", "max_views"),
                        ("border_check_thr", "border_check_thr"),
                        ("iterations_fine", "iterations_fine"),
                        ("prop_banks_fine", "prop_banks_fine")):
        v = getattr(ns, flag, None)
        if v is not None:
            kw[field] = v
    if getattr(ns, "color_processing", False):
        kw["color_processing"] = True
    if getattr(ns, "border_check", False):
        # Region border-consistency veto (main.cpp:1735-1780; default
        # ON as a documented quality divergence — config.border_check).
        kw["border_check"] = True
    if getattr(ns, "no_border_check", False):
        kw["border_check"] = False  # reference-exact (`if (false)`)
    return AlgorithmParams(**kw)


def cmd_gipuma(argv: list[str]) -> int:
    """Reference-CLI-compatible per-view run: first positional image is
    the reference view, the rest are sources (scripts/courtyard.sh:44).

    Full flag surface of getParametersFromCommandLine
    (main.cpp:708-1009). Flags whose semantics belong to Gipuma
    algorithm variants TSAR never runs (census/self-similarity:
    --algorithm != pm, --ss_n, --ct_eps, --cost_tau_*, --cost_alpha,
    --good_factor, --disp_tol, --norm_tol, --border_value,
    -color_processing) are parsed and recorded like the reference
    parses them, and warn when they select an unimplemented variant."""
    p = argparse.ArgumentParser(prog="tsar gipuma", add_help=False)
    p.add_argument("images", nargs="*")
    # --- input/output paths (main.cpp:905-937) ---
    p.add_argument("-mslp_folder", dest="mslp_folder", default=".")
    p.add_argument("-images_folder", dest="images_folder", default=None)
    p.add_argument("-p_folder", dest="p_folder", default=None)
    p.add_argument("-krt_file", dest="krt_file", default=None)
    p.add_argument("-calib_file", dest="calib_file", default=None)
    p.add_argument("-camera_folder", dest="camera_folder", default=None)
    p.add_argument("-bounding_folder", dest="bounding_folder", default=None)
    p.add_argument("-output_folder", dest="output_folder", default=None)
    p.add_argument("-o", dest="disparity_filename", default=None)
    p.add_argument("--pmvs_folder", dest="pmvs_folder", default=None)
    p.add_argument("--camera_idx", type=int, default=0)
    p.add_argument("--initial_seed", dest="seed_file", default=None)
    p.add_argument("-no_display", action="store_true")
    # --- GT check (main.cpp:741-744,871-882) ---
    p.add_argument("-gt", dest="gt", default=None)
    p.add_argument("-gt_nocc", dest="gt_nocc", default=None)
    p.add_argument("-occl_mask", dest="occl_mask", default=None)
    p.add_argument("-gt_normal", dest="gt_normal", default=None)
    p.add_argument("--gtDepth_divisionFactor", type=float, default=1.0)
    p.add_argument("--gtDepth_tolerance", type=float, default=1.0)
    p.add_argument("--gtDepth_tolerance2", type=float, default=0.1)
    # --- algorithm knobs ---
    p.add_argument("--algorithm", default="pm")
    p.add_argument("--max-disparity", dest="max_disparity", type=float,
                   default=None)
    p.add_argument("--cam_scale", type=float, default=1.0)
    p.add_argument("--iterations", type=int, default=8)
    p.add_argument("--blocksize", type=int, default=11)
    p.add_argument("--cost_gamma", type=float, default=10.0)
    p.add_argument("--cost_comb", default="best_n")
    p.add_argument("--n_best", type=int, default=1)
    p.add_argument("--min_angle", type=float, default=5.0)
    p.add_argument("--max_angle", type=float, default=45.0)
    p.add_argument("--max_views", type=int, default=14)
    p.add_argument("--depth_min", type=float, default=None)
    p.add_argument("--depth_max", type=float, default=None)
    p.add_argument("--num_img_processed", type=int, default=1)
    p.add_argument("-view_selection", action="store_true")
    # --- parsed-and-recorded Gipuma-variant knobs ---
    p.add_argument("--cost_tau_color", type=float, default=None)
    p.add_argument("--cost_tau_gradient", type=float, default=None)
    p.add_argument("--cost_alpha", type=float, default=None)
    p.add_argument("--good_factor", type=float, default=None)
    p.add_argument("--disp_tol", type=float, default=None)
    p.add_argument("--norm_tol", type=float, default=None)
    p.add_argument("--ss_n", type=int, default=None)
    p.add_argument("--ct_eps", type=float, default=None)
    p.add_argument("--border_value", type=int, default=None)
    p.add_argument("--no_texture_sim", type=float, default=None)
    p.add_argument("--no_texture_per", type=float, default=None)
    p.add_argument("-color_processing", action="store_true")
    p.add_argument("--border_check", action="store_true",
                   help="veto region fills with implausible border "
                        "depth jumps (default ON; main.cpp:1735-1780)")
    p.add_argument("--no_border_check", action="store_true",
                   help="reference-exact behavior (the veto sits "
                        "behind `if (false)` there)")
    p.add_argument("--border_check_thr", type=float, default=None)
    p.add_argument("--iterations_fine", type=int, default=None,
                   help="PatchMatch iterations on pyramid levels with a "
                        "lifted prior (0 = full --iterations everywhere; "
                        "default 3, config.iterations_fine)")
    p.add_argument("--prop_banks_fine", type=int, default=None,
                   help="propagation banks on lifted pyramid levels "
                        "(4 = near-only, default; 8 = reference banks)")
    # Reference scripts pass unset shell vars as empty values
    # (`--min_angle=`, scripts/courtyard.sh:44); sscanf ignores them —
    # drop such tokens so a script line runs verbatim.
    argv = [a for a in argv if not (a.startswith("-") and a.endswith("="))]
    ns, unknown = p.parse_known_args(argv)
    for u in unknown:
        print(f"Command-line parameter warning: unknown option {u}")
    if ns.algorithm != "pm":
        print(f"warning: --algorithm={ns.algorithm} selects a Gipuma "
              "variant TSAR does not run; proceeding with pm (NCC)")
    if ns.color_processing:
        # Color matching (main.cpp:766,909 float4 texture path). The
        # reference's own color instantiation reads the float4 texture
        # through tex2D<float> (gipuma.cu:248,263 — UB); ours implements
        # the float4 design intent (ops/ncc_color.py).
        print("color processing enabled: 3-channel bilateral NCC "
              "(direct sampler)")
    if ns.seed_file:
        # Reference parity: getParametersFromCommandLine stores
        # --initial_seed but no code path ever reads it
        # (main.cpp:934-935,947 — the print is commented out).
        print("warning: --initial_seed is parsed but unused, exactly as "
              "in the reference (main.cpp:935 stores it; nothing "
              "consumes it)")

    from tsar_mvs_tpu import pipeline
    if ns.pmvs_folder:
        # PMVS layout (main.cpp:949-964): images under visualize/, Strecha
        # P matrices under txt/, and --camera_idx picks the reference
        # image (the reference swaps it to slot 0).
        print(f"Using pmvs information inside directory {ns.pmvs_folder}")
        ns.images_folder = str(Path(ns.pmvs_folder) / "visualize")
        ns.p_folder = str(Path(ns.pmvs_folder) / "txt")
        ns.images = []
    scene = pipeline.load_scene(Path(ns.mslp_folder),
                                images_folder=ns.images_folder,
                                p_folder=ns.p_folder,
                                calib_file=ns.calib_file,
                                depth_min=ns.depth_min,
                                depth_max=ns.depth_max)
    if ns.pmvs_folder:
        ref_name = scene.names[ns.camera_idx]
        print(f"Using image {ref_name} as reference camera")
    else:
        ref_name = Path(ns.images[0]).stem if ns.images else scene.names[0]
    ref_idx = scene.names.index(ref_name)
    params = _alg_params(ns)
    if ns.bounding_folder:
        # Bounding volume (readBoundingVolume, fileIoUtils.h:56-68):
        # clamp the depth range to the box corners' depth in the ref view.
        scene = _apply_bounding_volume(scene, ref_idx, ns.bounding_folder)
    out_dir = None
    if ns.output_folder:
        out_dir = Path(ns.output_folder) / ref_name
    result = pipeline.process_view(scene, ref_idx, params, out_dir=out_dir,
                                   write_vis=not ns.no_display)

    if ns.gt:
        # GT harness on the gipuma surface (main.cpp:741-744 semantics:
        # disparity error with tolerance + optional occlusion mask).
        import json
        from tsar_mvs_tpu import eval as ev
        from tsar_mvs_tpu.utils.dmb import read_dmb
        from tsar_mvs_tpu.utils.synthetic import read_png_gray
        gt = read_dmb(ns.gt) / ns.gtDepth_divisionFactor
        occl = read_png_gray(ns.occl_mask) if ns.occl_mask else None
        r = ev.depth_error(result.depth, gt,
                           tolerance=ns.gtDepth_tolerance, occl_mask=occl)
        out = {"error": r.error, "error_nocc": r.error_nocc,
               "error_valid": r.error_valid}
        if ns.gt_normal:
            nr = ev.normal_error(result.normal_world, read_dmb(ns.gt_normal))
            out["normal_mean_deg"] = nr.mean_deg
        print(json.dumps(out))
    return 0


def _apply_bounding_volume(scene, ref_idx: int, bounding_folder: str):
    """Tighten the scene depth range from a per-scene bounding volume:
    project the 8 box corners into the reference camera and clamp
    [depth_min, depth_max] to their depth extent."""
    import dataclasses
    import numpy as np
    from tsar_mvs_tpu import geometry as geo
    from tsar_mvs_tpu.utils import scene_io
    bv = Path(bounding_folder)
    candidates = sorted(bv.glob("*.txt")) or [bv]
    bl, tr = scene_io.read_bounding_volume(candidates[0])
    corners = np.array([[x, y, z] for x in (bl[0], tr[0])
                        for y in (bl[1], tr[1]) for z in (bl[2], tr[2])])
    P = scene.P[ref_idx]
    depths = (P[2, :3] @ corners.T) + P[2, 3]
    dmin = float(max(depths.min(), 1e-6))
    dmax = float(depths.max())
    lo = max(scene.depth_min, dmin) if scene.depth_min > 0 else dmin
    hi = min(scene.depth_max, dmax) if scene.depth_max > 0 else dmax
    return dataclasses.replace(scene, depth_min=lo, depth_max=hi)


def cmd_scene(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="tsar scene")
    p.add_argument("scene_dir")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--blocksize", type=int, default=None)
    p.add_argument("--cam_scale", type=float, default=None)
    p.add_argument("--max_views", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-ply", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="skip views whose TSAR_disp.dmb already exists")
    p.add_argument("--fuse", action="store_true",
                   help="run fusion after all views")
    p.add_argument("--border_check", action="store_true",
                   help="veto region fills with implausible border "
                        "depth jumps (default ON; main.cpp:1735-1780)")
    p.add_argument("--no_border_check", action="store_true",
                   help="reference-exact behavior (veto off)")
    p.add_argument("--border_check_thr", type=float, default=None)
    p.add_argument("--iterations_fine", type=int, default=None,
                   help="PatchMatch iterations on lifted pyramid levels "
                        "(0 = full --iterations everywhere; default 3)")
    p.add_argument("--prop_banks_fine", type=int, default=None,
                   help="propagation banks on lifted pyramid levels "
                        "(4 = near-only, default; 8 = reference banks)")
    p.add_argument("-color_processing", dest="color_processing",
                   action="store_true",
                   help="3-channel bilateral NCC (main.cpp:1151-1185)")
    p.add_argument("--sharded", choices=("auto", "on", "off"),
                   default="auto",
                   help="view-sharded mesh execution across visible "
                        "devices (auto: when >1 device)")
    ns = p.parse_args(argv)
    from tsar_mvs_tpu import pipeline
    params = _alg_params(ns)
    sharded = {"auto": "auto", "on": True, "off": False}[ns.sharded]
    pipeline.process_scene(ns.scene_dir, params, seed=ns.seed,
                           write_ply=not ns.no_ply, resume=ns.resume,
                           sharded=sharded)
    if ns.fuse:
        out = pipeline.fuse_scene(ns.scene_dir)
        print(f"fused cloud: {out}")
    return 0


def cmd_view(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="tsar view")
    p.add_argument("scene_dir")
    p.add_argument("ref", help="view index or name")
    p.add_argument("--iterations", type=int, default=None)
    p.add_argument("--blocksize", type=int, default=None)
    p.add_argument("--vis", action="store_true",
                   help="write normal/disparity/confidence PNGs + "
                        "parameter dump")
    ns = p.parse_args(argv)
    from tsar_mvs_tpu import pipeline
    scene = pipeline.load_scene(ns.scene_dir)
    ref_idx = (int(ns.ref) if ns.ref.isdigit()
               else scene.names.index(ns.ref))
    pipeline.process_view(scene, ref_idx, _alg_params(ns),
                          write_vis=ns.vis)
    return 0


def cmd_fuse(argv: list[str]) -> int:
    """Fusion with the reference Fusion.exe flag names (x/1.sh:28-30)."""
    p = argparse.ArgumentParser(prog="tsar fuse")
    p.add_argument("scene_dir")
    p.add_argument("--num_consistent", type=int, default=1)
    p.add_argument("--reproj_error", type=float, default=2.0)
    p.add_argument("--depth_diff", type=float, default=0.01)
    p.add_argument("--angle", type=float, default=15.0)
    p.add_argument("--used_list", type=int, default=1)
    ns = p.parse_args(argv)
    from tsar_mvs_tpu import pipeline
    from tsar_mvs_tpu.config import FusionParams
    fp = FusionParams(depth_diff=ns.depth_diff,
                      normal_thresh_deg=ns.angle,
                      num_consistent=ns.num_consistent,
                      reproj_error=ns.reproj_error,
                      used_list=bool(ns.used_list))
    out = pipeline.fuse_scene(ns.scene_dir, fp)
    print(f"fused cloud: {out}")
    return 0


def cmd_synth(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="tsar synth")
    p.add_argument("out_dir")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    ns = p.parse_args(argv)
    from tsar_mvs_tpu.utils.synthetic import make_scene
    scene = make_scene(height=ns.height, width=ns.width,
                       num_views=ns.views, seed=ns.seed)
    root = scene.export(ns.out_dir)
    print(f"synthetic scene written to {root}")
    return 0


def cmd_eval(argv: list[str]) -> int:
    """GT evaluation (the reference's -gt/-gt_normal/--gtDepth_tolerance
    harness, groundTruthUtils.h:22-139 + main.cpp:741-744,871-882)."""
    p = argparse.ArgumentParser(prog="tsar eval")
    p.add_argument("est", help="estimated depth .dmb/.pfm")
    p.add_argument("gt", help="ground-truth depth .dmb/.pfm")
    p.add_argument("--gtDepth_tolerance", type=float, default=1.0,
                   dest="tolerance")
    p.add_argument("--occl_mask", default=None)
    p.add_argument("--est_normal", default=None)
    p.add_argument("--gt_normal", default=None)
    p.add_argument("--fscore", action="store_true",
                   help="treat est/gt as .ply point clouds and report "
                        "F1@2cm")
    p.add_argument("--threshold", type=float, default=0.02)
    ns = p.parse_args(argv)
    import json
    from tsar_mvs_tpu import eval as ev

    if ns.fscore:
        from tsar_mvs_tpu.utils.ply import read_ply
        est = read_ply(ns.est)[0]
        gt = read_ply(ns.gt)[0]
        r = ev.point_cloud_fscore(est, gt, threshold=ns.threshold)
        print(json.dumps({"precision": r.precision, "recall": r.recall,
                          "f1": r.f1, "threshold": r.threshold}))
        return 0

    def load(path):
        path = Path(path)
        if path.suffix == ".pfm":
            from tsar_mvs_tpu.utils.pfm import read_pfm
            return read_pfm(path)
        from tsar_mvs_tpu.utils.dmb import read_dmb
        return read_dmb(path)

    occl = None
    if ns.occl_mask:
        from tsar_mvs_tpu.utils.synthetic import read_png_gray
        occl = read_png_gray(ns.occl_mask)
    r = ev.depth_error(load(ns.est), load(ns.gt), tolerance=ns.tolerance,
                       occl_mask=occl)
    out = {"error": r.error, "error_nocc": r.error_nocc,
           "error_valid": r.error_valid,
           "error_valid_all": r.error_valid_all,
           "abs_err_mean": r.abs_err_mean, "num_gt": r.num_gt,
           "num_valid": r.num_valid}
    if ns.est_normal and ns.gt_normal:
        nr = ev.normal_error(load(ns.est_normal), load(ns.gt_normal))
        out.update({"normal_mean_deg": nr.mean_deg,
                    "normal_median_deg": nr.median_deg})
    print(json.dumps(out))
    return 0


def cmd_bench(argv: list[str]) -> int:
    import subprocess
    return subprocess.call([sys.executable,
                            str(Path(__file__).resolve().parents[1]
                                / "bench.py")] + argv)


COMMANDS = {
    "gipuma": cmd_gipuma,
    "scene": cmd_scene,
    "view": cmd_view,
    "fuse": cmd_fuse,
    "synth": cmd_synth,
    "eval": cmd_eval,
    "bench": cmd_bench,
}


def main(argv: list[str] | None = None) -> int:
    import os
    if os.environ.get("TSAR_FORCE_CPU") == "1":
        # The tunneled TPU plugin ignores JAX_PLATFORMS; subprocess
        # callers (tests, batch scripts) force CPU through jax.config.
        import jax
        jax.config.update("jax_platforms", "cpu")
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: tsar {" + ",".join(COMMANDS) + "} ...")
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        # Bare reference-style invocation: treat as gipuma.
        return cmd_gipuma(argv)
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
