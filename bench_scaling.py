#!/usr/bin/env python
"""Scaling-efficiency harness: depthmaps/s vs device count on the
view-sharded mesh (SURVEY.md §7 layer 7; BASELINE.json >=0.85 target).

Weak scaling: each device processes the same number of reference views
(R = refs_per_dev * n_dev), so ideal scaling is constant wall-clock and
efficiency = t(1) / t(n). Also exercises multi-scene batching: scenes
are concatenated along the reference-view axis (the per-view unit is
self-contained, so cross-scene batching is just a bigger batch).

On a single-chip host, run with TSAR_SCALE_CPU=1 for a spoofed 8-device
CPU mesh (measures the sharding overhead structure; the tunneled TPU
plugin ignores JAX_PLATFORMS, so the switch happens via jax.config).
On a real multi-chip/multi-host fleet, set TSAR_COORDINATOR et al.
(parallel.distributed) and run unmodified.

Prints one JSON line per device count plus a final summary line with the
scaling efficiency at the largest count.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    if os.environ.get("TSAR_SCALE_CPU") == "1":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device"
                                     "_count=8").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")

    from tsar_mvs_tpu.parallel import distributed
    distributed.initialize()

    import jax
    from tsar_mvs_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from tsar_mvs_tpu import geometry as geo
    from tsar_mvs_tpu.config import AlgorithmParams
    from tsar_mvs_tpu.models import patchmatch as pm
    from tsar_mvs_tpu.parallel import mesh as pmesh
    from tsar_mvs_tpu.utils.synthetic import make_scene

    H = int(os.environ.get("TSAR_SCALE_H", 96))
    W = int(os.environ.get("TSAR_SCALE_W", 128))
    iters = int(os.environ.get("TSAR_SCALE_ITERS", 2))
    refs_per_dev = int(os.environ.get("TSAR_SCALE_REFS_PER_DEV", 1))
    num_scenes = int(os.environ.get("TSAR_SCALE_SCENES", 2))
    # "weak": R grows with devices (constant work per device; ideal =
    # flat wall-clock). "strong": R is FIXED at refs_per_dev *
    # max(devices) for every device count — on a spoofed CPU mesh, where
    # all "devices" share one socket's cores, this separates real
    # sharding/partitioning overhead (t(n)/t(1) - 1 at equal total work)
    # from core contention, which weak scaling conflates with it.
    mode = os.environ.get("TSAR_SCALE_MODE", "weak")
    n_src = 3

    all_dev = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= all_dev]
    print(f"# scaling[{mode}]: {H}x{W}x{iters}it, {refs_per_dev} "
          f"refs/dev, {num_scenes} scenes, devices={all_dev} "
          f"({jax.devices()[0].platform})", file=sys.stderr)

    results = []
    for n_dev in counts:
        R = refs_per_dev * (max(counts) if mode == "strong" else n_dev)
        # Multi-scene batching: round-robin the scenes' views into one
        # batch (each scene contributes R // num_scenes or so refs).
        batches = []
        imgs_list = []
        base = 0
        for s in range(num_scenes):
            scene = make_scene(height=H, width=W,
                               num_views=max(n_src + 1, 4), seed=s)
            r_s = (R // num_scenes + (1 if s < R % num_scenes else 0))
            if r_s == 0:
                continue
            V = scene.num_views
            ref_ids = [i % V for i in range(r_s)]
            src_ids = [[j for j in range(V) if j != r][:n_src]
                       for r in ref_ids]
            b = pm.build_scene_batch(list(scene.P), ref_ids, src_ids,
                                     n_src)
            # Offset image ids into the concatenated image stack.
            b = pm.SceneBatch(ref_ids=b.ref_ids + base,
                              src_ids=b.src_ids + base,
                              src_valid=b.src_valid, A=b.A, b=b.b)
            batches.append(b)
            imgs_list.append(np.asarray(scene.images, np.float32))
            base += scene.num_views
        batch = jax.tree.map(lambda *xs: jnp.concatenate(xs), *batches)
        imgs = jnp.asarray(np.concatenate(imgs_list))
        cams = geo.build_camera_set(list(scene.P),
                                    depth_min=scene.depth_min,
                                    depth_max=scene.depth_max)
        params = AlgorithmParams(iterations=iters).with_depth_range(
            scene.depth_min, scene.depth_max, float(cams.f))

        mesh = pmesh.view_mesh(n_dev)
        key = jax.random.PRNGKey(0)

        def run():
            st = pmesh.patchmatch_sharded(mesh, key, imgs, batch, cams,
                                          params, iterations=iters)
            # Force completion with a host transfer (block_until_ready
            # does not reliably block on the axon TPU tunnel).
            return float(jnp.sum(st.cost))

        # Optional per-phase split: the view-sharded pipeline's only
        # collective is fusion's all-gather — timing it separately
        # separates communication from compute contention
        # (TSAR_SCALE_FUSE=1; pads the ref count to the mesh).
        fuse_phase = os.environ.get("TSAR_SCALE_FUSE") == "1"
        if fuse_phase:
            from tsar_mvs_tpu.config import FusionParams
            Vf = (R + n_dev - 1) // n_dev * n_dev
            cams_w = geo.build_camera_set(
                [np.asarray(scene.P[i % scene.num_views])
                 for i in range(Vf)], rebase=False)
            dmaps = jnp.asarray(
                np.stack([np.where(np.isfinite(scene.depth[i % 4]),
                                   scene.depth[i % 4], 0.0)
                          for i in range(Vf)]), jnp.float32)
            nmaps = jnp.asarray(
                np.stack([scene.normal_world[i % 4] for i in range(Vf)]))

            def run_fuse():
                out = pmesh.fuse_sharded(mesh, dmaps, nmaps, cams_w,
                                         FusionParams())
                return float(jnp.sum(out[2]))

        run()  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        rec = {"devices": n_dev, "refs": R, "wall_s": round(t, 4),
               "depthmaps_per_s": round(R / t, 3)}
        if fuse_phase:
            run_fuse()  # compile
            fts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run_fuse()
                fts.append(time.perf_counter() - t0)
            rec["fuse_s"] = round(min(fts), 4)
        dm_s = R / t
        results.append((n_dev, t, dm_s))
        print(json.dumps(rec))

    t1 = results[0][1]
    tn = results[-1][1]
    n_ratio = results[-1][0] / results[0][0]
    spoofed = (jax.devices()[0].platform == "cpu"
               and os.environ.get("TSAR_SCALE_CPU") == "1")
    if mode == "strong" and not spoofed:
        # Real devices at fixed total work: ideal is t(n) = t(1)/n, so
        # efficiency normalizes the speedup by the device ratio (on the
        # spoofed single-socket mesh ideal is flat wall-clock instead —
        # every "device" shares one socket's cores).
        speedup = t1 / tn
        eff = speedup / n_ratio
        print(json.dumps({
            "metric": "strong_scaling_speedup",
            "value": round(speedup, 3),
            "unit": f"t(1dev)/t({results[-1][0]}dev) @{H}x{W}",
        }))
        print(json.dumps({
            "metric": "strong_scaling_efficiency",
            "value": round(eff, 3),
            "unit": f"t(1)/(n*t(n)), n={results[-1][0]} @{H}x{W}",
            "vs_baseline": round(eff / 0.85, 3),
        }))
        return 0
    eff = t1 / tn  # ideal == 1.0: flat wall-clock (see `mode` above)
    out = {
        "metric": f"{mode}_scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"t(1dev)/t({results[-1][0]}dev) @{H}x{W}",
        "vs_baseline": round(eff / 0.85, 3),
    }
    if mode == "strong" and spoofed:
        # Flag: the 0.85 weak-scaling bar only meaningfully applies to
        # the flat-wall-clock ideal of the spoofed mesh.
        out["note"] = ("spoofed CPU mesh: fixed total work, ideal flat "
                       "wall-clock; measures sharding overhead only")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
