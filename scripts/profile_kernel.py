#!/usr/bin/env python
"""Kernel-level roofline profile for the Pallas s-volume NCC kernel.

Times single multiview cost evaluations (prop-shaped C=8 and
refine-shaped C=1) on a converged and a perturbed plane field, and
computes the host-side s-bracket statistics (planes walked per tile)
that set the kernel's work term — giving PERF.md's roofline a measured
n_planes instead of a guess.

Env: TSAR_BENCH_H/W/VIEWS (bench defaults 672x1024x4), TSAR_PALLAS_CBLK.
"""

from __future__ import annotations

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

    import jax
    from tsar_mvs_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from tsar_mvs_tpu import geometry as geo
    from tsar_mvs_tpu.config import AlgorithmParams
    from tsar_mvs_tpu.models import patchmatch as pm
    from tsar_mvs_tpu.ops import checkerboard as cb
    from tsar_mvs_tpu.ops import ncc
    from tsar_mvs_tpu.ops import pallas_ncc as pn
    from tsar_mvs_tpu.ops import svolume as sv
    from tsar_mvs_tpu.utils.synthetic import make_scene

    print(f"# kernel profile: {H}x{W}, {V} views on "
          f"{jax.devices()[0].platform}, CBLK={pn._cblk()} "
          f"TILE_H={pn.TILE_H}", file=sys.stderr)
    scene = make_scene(height=H, width=W, num_views=V, seed=0)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = tuple(range(1, V))
    idx = jnp.asarray(view_ids, jnp.int32)
    stats = ncc.precompute_ref_stats(imgs[0], cams, params)
    s_lo, s_hi = sv.s_range_for_depths(scene.depth_min, scene.depth_max,
                                       params.svolume_margin)
    counts = pm.svolume_plane_counts(cams, view_ids, H, W, params)
    vol = sv.build_svolume(imgs[idx], cams.A[idx], cams.b[idx],
                           s_lo, s_hi, counts)
    vols_p = pn.prepare_parity_volumes(vol.data, H, W)
    inv_ds = tuple((c - 1) / (s_hi - s_lo) for c in counts)
    valid = [True] * len(view_ids)
    stats_p = {p: ncc.compress_stats(stats, p) for p in (0, 1)}

    def force(x):
        leaves = jax.tree.leaves(x)
        _ = np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))
        return x

    # Fields: "converged" = GT-ish smooth field; "perturbed" = GT +
    # coarse-scale random disparity perturbation (first refine scale).
    gt = np.where(np.isfinite(scene.depth[0]), scene.depth[0],
                  0.5 * (scene.depth_min + scene.depth_max))
    rays = geo.pixel_rays(cams, H, W)
    vv = geo.view_vectors(cams, H, W)

    def field(perturb: float, key=0):
        depth = jnp.asarray(gt, jnp.float32)
        if perturb > 0:
            disp = geo.disparity_depth(cams.f, cams.baseline, depth)
            u = jax.random.uniform(jax.random.PRNGKey(key), (H, W),
                                   jnp.float32, -perturb, perturb)
            disp = jnp.clip(disp + u, params.min_disparity,
                            params.max_disparity)
            depth = geo.disparity_depth(cams.f, cams.baseline, disp)
        n = jnp.asarray(np.stack([np.full((H, W), 0.05),
                                  np.full((H, W), 0.03),
                                  np.ones((H, W))], -1), jnp.float32)
        n = geo.hemisphere_flip(geo.normalize(n), vv)
        d = geo.plane_d_from_depth(n, rays, depth)
        return n, d

    @jax.jit
    def eval_packed(vols, n_p, d_p):
        # vols as ARGUMENTS: closing over them bakes ~3 GB of constants
        # into the lowering and stalls compilation for tens of minutes.
        return pn.multiview_cost_pallas(vols, counts, float(s_lo),
                                        inv_ds, idx, valid, n_p, d_p,
                                        stats_p[0], params, 0)

    def time_eval(n, d, C, reps=3):
        print(f"# time_eval C={C} ...", file=sys.stderr, flush=True)
        n_p = cb.parity_compress_vec(n, 0)
        d_p = cb.parity_compress(d, 0)
        if C > 1:
            n_p = jnp.broadcast_to(n_p[None], (C,) + n_p.shape)
            d_p = jnp.broadcast_to(d_p[None], (C,) + d_p.shape)
            # jitter candidates slightly so brackets aren't degenerate
            d_p = d_p * (1.0 + 1e-4 * jnp.arange(C)[:, None, None])
        force(eval_packed(vols_p[0], n_p, d_p))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            force(eval_packed(vols_p[0], n_p, d_p))
            ts.append(time.time() - t0)
        return min(ts)

    # Host-side bracket statistics for view 0 (worst + mean planes
    # walked per tile) — replicates the kernel's tmin/tmax reduction.
    def bracket_stats(n, d, C=1):
        from tsar_mvs_tpu.ops.svolume import plane_scalars
        n_p = cb.parity_compress_vec(n, 0)
        d_p = cb.parity_compress(d, 0)
        s0, sx, sy = (np.asarray(a) for a in
                      plane_scalars(n_p, d_p, stats_p[0]))
        rep = {}
        for v in range(len(counts)):
            S = counts[v]
            ivd = inv_ds[v]
            tc = (s0 - s_lo) * ivd
            sxn, syn = sx * ivd, sy * ivd
            reach = 5 * np.abs(sxn) + 5 * np.abs(syn)
            lo = np.clip(tc - reach, 0, S - 1)
            hi = np.clip(tc + reach, 0, S - 1)
            th, tw = pn.TILE_H, pn.TILE_W
            Hc, Wc = lo.shape
            nh, nw = -(-Hc // th), -(-Wc // tw)
            pads = ((0, nh * th - Hc), (0, nw * tw - Wc))
            lo_t = np.pad(lo, pads, constant_values=np.inf).reshape(
                nh, th, nw, tw).min(axis=(1, 3))
            hi_t = np.pad(hi, pads, constant_values=-np.inf).reshape(
                nh, th, nw, tw).max(axis=(1, 3))
            span = np.maximum(0, hi_t - lo_t + 1)
            rep[f"v{v}"] = {"S": S, "mean_planes": round(float(
                span.mean()), 1), "p90": round(float(
                    np.quantile(span, 0.9)), 1)}
        return rep

    out = {"counts": list(counts), "point": f"{H}x{W}/{V - 1}src"}
    n_c, d_c = field(0.0)
    n_p8, d_p8 = field(params.max_disparity / 2)  # first refine scale
    n_p1, d_p1 = field(params.max_disparity / 20)  # second refine scale
    print("# bracket stats ...", file=sys.stderr, flush=True)
    out["bracket_converged"] = bracket_stats(n_c, d_c)
    out["bracket_coarse_perturb"] = bracket_stats(n_p8, d_p8)
    out["bracket_mid_perturb"] = bracket_stats(n_p1, d_p1)
    print(json.dumps(out), file=sys.stderr, flush=True)
    out["eval_C1_converged_s"] = round(time_eval(n_c, d_c, 1), 4)
    out["eval_C1_coarse_s"] = round(time_eval(n_p8, d_p8, 1), 4)
    out["eval_C1_mid_s"] = round(time_eval(n_p1, d_p1, 1), 4)
    out["eval_C8_converged_s"] = round(time_eval(n_c, d_c, 8), 4)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
