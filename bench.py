#!/usr/bin/env python
"""Benchmark: depthmaps/sec/chip on an ETH3D-2K-scale synthetic scene.

Runs the per-view depthmap pipeline (8-iteration checkerboard PatchMatch +
confidence + coarse WMF outlier marking + finalize) on the available
accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no timing tables (BASELINE.md); its
per-view wall-clock on the dev GPU (GTX 980, README.md:30-41) for an
ETH3D-scale view at the scripts' operating point is on the order of 20 s
=> 0.05 depthmaps/sec. vs_baseline is measured against that estimate.

Env overrides: TSAR_BENCH_H/W/VIEWS/ITERS/REPEATS, TSAR_BENCH_SMALL=1 for
a quick CPU-sized run.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    small = os.environ.get("TSAR_BENCH_SMALL") == "1"
    # Default operating point: half-linear ETH3D resolution, 3 source
    # views (the largest configuration currently validated on the v5e
    # chip — the full 1344x2048x7src program still faults the TPU worker
    # at execution, see PERF.md). vs_baseline scales the GTX 980
    # reference estimate by pixels and source views so the comparison
    # stays apples-to-apples across operating points.
    H = int(os.environ.get("TSAR_BENCH_H", 160 if small else 672))
    W = int(os.environ.get("TSAR_BENCH_W", 224 if small else 1024))
    V = int(os.environ.get("TSAR_BENCH_VIEWS", 4 if small else 4))
    iters = int(os.environ.get("TSAR_BENCH_ITERS", 2 if small else 8))
    repeats = int(os.environ.get("TSAR_BENCH_REPEATS", 2))

    import jax
    if small:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TSAR_JAX_CACHE",
                                     "/tmp/tsar_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from tsar_mvs_tpu import geometry as geo
    from tsar_mvs_tpu.config import AlgorithmParams
    from tsar_mvs_tpu.models import patchmatch as pm
    from tsar_mvs_tpu.models import tsar
    from tsar_mvs_tpu.utils.synthetic import make_scene

    print(f"# bench: {H}x{W}, {V} views, {iters} iters on "
          f"{jax.devices()[0].platform}", file=sys.stderr)
    scene = make_scene(height=H, width=W, num_views=V, seed=0)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams(iterations=iters).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = tuple(range(1, V))

    def one_view(key):
        state = pm.run_patchmatch(key, imgs, view_ids, cams, params,
                                  iterations=iters)
        confid, lrdiff, disp = tsar.confidence_stage(
            imgs, view_ids, cams, state, params)
        reliable = tsar.wmf_stage(imgs[0], cams, state, disp,
                                  jnp.ones(disp.shape, bool), params,
                                  iters=2 if small else 4)
        depth, n_world = tsar.finalize_stage(cams, state)
        return depth, n_world, confid, reliable

    # Warm-up (compile)
    t0 = time.time()
    out = one_view(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    print(f"# warmup (incl. compile): {compile_s:.1f}s", file=sys.stderr)

    # Optional jax.profiler trace of the timed region (SURVEY.md §5's
    # tracing equivalent): TSAR_BENCH_PROFILE=<dir> writes a TensorBoard
    # trace of one timed view.
    profile_dir = os.environ.get("TSAR_BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            out = one_view(jax.random.PRNGKey(99))
            jax.block_until_ready(out)
        print(f"# profile trace written to {profile_dir}",
              file=sys.stderr)

    times = []
    for r in range(repeats):
        t0 = time.time()
        out = one_view(jax.random.PRNGKey(r + 1))
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    per_view = min(times)
    dm_per_s = 1.0 / per_view

    # Sanity: converged cost should be low on textured pixels.
    depth = np.asarray(out[0])
    gt = scene.depth[0]
    ok = np.isfinite(gt) & ~scene.weak_mask[0]
    rel_err = np.abs(depth - gt) / np.where(np.isfinite(gt), gt, 1.0)
    acc2 = float((rel_err[ok] < 0.02).mean())
    print(f"# per-view: {per_view:.3f}s  acc<2%: {acc2:.3f}",
          file=sys.stderr)

    # ~20 s/view at 1344x2048 with 7 source views on a GTX 980 (see
    # header); cost scales ~linearly in pixels and source views.
    baseline_dm_per_s = 0.05 * (1344 * 2048 / (H * W)) * (7 / max(V - 1, 1))
    print(json.dumps({
        "metric": "depthmaps/sec/chip",
        "value": round(dm_per_s, 4),
        "unit": f"depthmaps/s @{H}x{W}x{iters}it/{V - 1}src",
        "vs_baseline": round(dm_per_s / baseline_dm_per_s, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
