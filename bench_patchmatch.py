#!/usr/bin/env python
"""PatchMatch sampler A/B: direct vs svolume vs pallas at one point.

Times ONLY the PatchMatch stage (the coarse-to-fine pyramid exactly as
bench.py's patchmatch stage runs it) for each requested NCC sampler
implementation, on the same synthetic scene, and prints one JSON line
per impl:

    {"impl": ..., "per_view_s": N, "warmup_s": N, "acc2_pm": N}

Env: TSAR_BENCH_H/W/VIEWS/ITERS (bench.py defaults), TSAR_AB_IMPLS
(comma list, default "direct,svolume,pallas"), TSAR_AB_REPEATS,
TSAR_AB_STEP (svolume_step_px override), TSAR_AB_RBF
(refine_block_frac override).

The committed results live in PERF.md ("sampler A/B" table).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    H = int(os.environ.get("TSAR_BENCH_H", 672))
    W = int(os.environ.get("TSAR_BENCH_W", 1024))
    V = int(os.environ.get("TSAR_BENCH_VIEWS", 4))
    iters = int(os.environ.get("TSAR_BENCH_ITERS", 8))
    repeats = int(os.environ.get("TSAR_AB_REPEATS", 2))
    impls = os.environ.get("TSAR_AB_IMPLS", "direct,svolume,pallas").split(",")

    import jax
    from tsar_mvs_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from tsar_mvs_tpu import geometry as geo
    from tsar_mvs_tpu.config import AlgorithmParams
    from tsar_mvs_tpu.models import patchmatch as pm
    from tsar_mvs_tpu.utils.synthetic import make_scene, source_coverage

    print(f"# ab: {H}x{W}, {V} views, {iters} iters on "
          f"{jax.devices()[0].platform}", file=sys.stderr)
    scene = make_scene(height=H, width=W, num_views=V, seed=0)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = tuple(range(1, V))
    levels = (4, 2, 1) if H >= 1024 else (2, 1)

    gt = scene.depth[0]
    cover = source_coverage(scene, ref=0, src_views=view_ids)
    ok = np.isfinite(gt) & ~scene.weak_mask[0] & (cover >= 1)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]

    def force(x):
        leaves = jax.tree.leaves(x)
        _ = np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))
        return x

    extra = {}
    if os.environ.get("TSAR_AB_STEP"):
        extra["svolume_step_px"] = float(os.environ["TSAR_AB_STEP"])
    if os.environ.get("TSAR_AB_RBF"):
        extra["refine_block_frac"] = float(os.environ["TSAR_AB_RBF"])
    if os.environ.get("TSAR_AB_DZ0"):
        extra["refine_dz0_frac"] = float(os.environ["TSAR_AB_DZ0"])
    if os.environ.get("TSAR_AB_DZ0F"):
        extra["refine_dz0_frac_fine"] = float(os.environ["TSAR_AB_DZ0F"])
    if os.environ.get("TSAR_AB_STEPPX_BUDGET"):
        extra["svolume_budget_mb"] = int(
            os.environ["TSAR_AB_STEPPX_BUDGET"])
    if os.environ.get("TSAR_AB_BANKSF"):
        extra["prop_banks_fine"] = int(os.environ["TSAR_AB_BANKSF"])
    # TSAR_AB_COLOR=1: run the -color_processing path (3-channel NCC on
    # the direct sampler; synthetic scenes are grayscale, so channels
    # are scaled copies — exercises the full 3x memory/compute shape).
    color = os.environ.get("TSAR_AB_COLOR") == "1"
    # TSAR_AB_SCHED=8,4 : per-pyramid-level iteration counts (coarse to
    # fine); must match len(levels). Default: the product policy
    # (config.iterations_fine on lifted levels).
    sched = None
    if os.environ.get("TSAR_AB_SCHED"):
        sched = tuple(int(t) for t in
                      os.environ["TSAR_AB_SCHED"].split(","))
        assert len(sched) == len(levels), (sched, levels)
    imgs_color = None
    if color:
        extra["color_processing"] = True
        rgb = np.repeat(np.asarray(scene.images)[:, None], 3,
                        axis=1).astype(np.float32)
        rgb[:, 1] *= 0.8
        rgb[:, 2] *= 0.6
        imgs_color = jnp.asarray(rgb)

    for impl in impls:
        params = AlgorithmParams(
            iterations=iters, ncc_impl=impl, **extra).with_depth_range(
            scene.depth_min, scene.depth_max, float(cams.f))

        def run(key):
            return force(pm.run_patchmatch_pyramid(
                key, imgs, view_ids, list(scene.P), params, levels=levels,
                iterations_per_level=sched,
                depth_min=scene.depth_min, depth_max=scene.depth_max,
                imgs_color=imgs_color))

        t0 = time.time()
        try:
            state = run(jax.random.PRNGKey(0))
        except Exception as e:  # noqa: BLE001 — report per-impl failure
            print(json.dumps({"impl": impl, "error": repr(e)[:300]}))
            continue
        warmup = time.time() - t0
        times = []
        for r in range(repeats):
            t0 = time.time()
            state = run(jax.random.PRNGKey(r + 1))
            times.append(time.time() - t0)
        depth_pm = np.asarray(geo.depth_from_plane(cams, state.normal,
                                                   state.d, xx, yy))
        rel = np.abs(depth_pm - gt) / np.where(np.isfinite(gt), gt, 1.0)
        acc = float((rel[ok] < 0.02).mean())
        print(json.dumps({"impl": impl, "per_view_s": round(min(times), 3),
                          "warmup_s": round(warmup, 1),
                          "acc2_pm": round(acc, 4),
                          "point": f"{H}x{W}x{iters}it/{V - 1}src"}))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
