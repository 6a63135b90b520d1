#!/usr/bin/env python
"""Attribute PatchMatch pyramid wall-clock to its phases.

Replicates pm.run_patchmatch_pyramid's loop with a force() between
phases: per-level jitted PatchMatch vs the inter-level upsample +
cost re-evaluation (which ran as EAGER direct-gather ops before round
5). Prints one JSON line with the per-phase seconds.

Env: TSAR_BENCH_H/W/VIEWS/ITERS (bench.py defaults), TSAR_NCC_IMPL.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    H = int(os.environ.get("TSAR_BENCH_H", 672))
    W = int(os.environ.get("TSAR_BENCH_W", 1024))
    V = int(os.environ.get("TSAR_BENCH_VIEWS", 4))
    iters = int(os.environ.get("TSAR_BENCH_ITERS", 8))

    import jax
    from tsar_mvs_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from tsar_mvs_tpu import geometry as geo
    from tsar_mvs_tpu.config import AlgorithmParams
    from tsar_mvs_tpu.models import patchmatch as pm
    from tsar_mvs_tpu.ops import ncc
    from tsar_mvs_tpu.utils.synthetic import make_scene

    print(f"# profile: {H}x{W}, {V} views, {iters} iters on "
          f"{jax.devices()[0].platform}", file=sys.stderr)
    scene = make_scene(height=H, width=W, num_views=V, seed=0)
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = tuple(range(1, V))
    levels = (4, 2, 1) if H >= 1024 else (2, 1)
    params0 = AlgorithmParams(
        iterations=iters,
        ncc_impl=os.environ.get("TSAR_NCC_IMPL", "auto"))
    P_list = list(scene.P)
    dmin, dmax = scene.depth_min, scene.depth_max

    def force(x):
        leaves = jax.tree.leaves(x)
        _ = np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))
        return x

    def one_pass(key, phases):
        def mark(name, t0):
            phases[name] = phases.get(name, 0.0) + time.time() - t0
            return time.time()

        pyr = {1: imgs}
        fac, cur = 1, imgs
        while fac < max(levels):
            cur = pm.downsample_2x(cur)
            fac *= 2
            pyr[fac] = cur
        state = None
        t0 = time.time()
        for li, s in enumerate(levels):
            cams_s = geo.build_camera_set(P_list, cam_scale=float(s),
                                          depth_min=dmin, depth_max=dmax)
            params_s = dataclasses.replace(params0).with_depth_range(
                dmin, dmax, float(cams_s.f))
            imgs_s = pyr[s]
            if state is not None:
                Hs, Ws = imgs_s.shape[1:]
                state = force(pm.upsample_state_2x(state, cams_s, Hs, Ws))
                t0 = mark(f"upsample_L{s}", t0)
                stats = ncc.precompute_ref_stats(imgs_s[0], cams_s,
                                                 params_s)
                mv = ncc.multiview_cost(imgs_s, view_ids, cams_s,
                                        state.normal, state.d, stats,
                                        params_s)
                state = force(pm.PlaneState(
                    normal=state.normal, d=state.d, cost=mv.cost,
                    ratio=mv.ratio, best_view=mv.best_view))
                t0 = mark(f"reeval_L{s}", t0)
            state = force(pm.run_patchmatch(
                jax.random.fold_in(key, li), imgs_s, view_ids, cams_s,
                params_s, iterations=iters, init_state=state))
            t0 = mark(f"pm_L{s}", t0)
        return state

    t0 = time.time()
    one_pass(jax.random.PRNGKey(0), {})
    warm = time.time() - t0
    print(f"# warmup: {warm:.1f}s", file=sys.stderr)
    phases: dict[str, float] = {}
    t0 = time.time()
    one_pass(jax.random.PRNGKey(1), phases)
    total = time.time() - t0
    print(json.dumps({"total_s": round(total, 2), "warmup_s": round(warm, 1),
                      "phases": {k: round(v, 2)
                                 for k, v in phases.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
