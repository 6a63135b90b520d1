import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tsar_jax_cache")
import jax.numpy as jnp, numpy as np
from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.ops import checkerboard as cb, ncc, pallas_ncc as pn, svolume as sv
from tsar_mvs_tpu.utils.synthetic import make_scene

H, W = 672, 1024
scene = make_scene(height=H, width=W, num_views=4, seed=0)
cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min, depth_max=scene.depth_max)
params = AlgorithmParams().with_depth_range(scene.depth_min, scene.depth_max, float(cams.f))
imgs = jnp.asarray(scene.images, jnp.float32)
view_ids = (1, 2, 3)
stats = ncc.precompute_ref_stats(imgs[0], cams, params)
idx = jnp.asarray(view_ids, jnp.int32)
s_lo, s_hi = sv.s_range_for_depths(scene.depth_min, scene.depth_max, params.svolume_margin)
counts = sv.plane_counts(np.asarray(cams.A[idx]), np.asarray(cams.b[idx]), H, W, s_lo, s_hi,
                         budget_bytes=params.svolume_budget_mb << 20)
print("counts", counts, flush=True)
vol = sv.build_svolume(imgs[idx], cams.A[idx], cams.b[idx], s_lo, s_hi, counts)
vols_p = pn.prepare_parity_volumes(vol.data, H, W)

# converged-like field + prop-like candidate batch (8 spatial shifts)
gt = np.where(np.isfinite(scene.depth[0]), scene.depth[0], 0.5*(scene.depth_min+scene.depth_max))
depth = jnp.asarray(gt, jnp.float32)
n = geo.hemisphere_flip(geo.normalize(jnp.asarray(
    np.stack([np.full((H,W),0.05), np.full((H,W),0.03), np.ones((H,W))],-1), jnp.float32)),
    geo.view_vectors(cams, H, W))
d = geo.plane_d_from_depth(n, geo.pixel_rays(cams, H, W), depth)
shifts = [(0,0),(0,-2),(0,2),(-2,0),(2,0),(0,-6),(6,0),(-1,-1)]
def sh(a, dy, dx):
    return jnp.roll(a, (dy, dx), axis=(0,1))
nC = jnp.stack([sh(n, dy, dx) for (dy,dx) in shifts])
dC = jnp.stack([sh(d, dy, dx) for (dy,dx) in shifts])
parity = 0
stats_p = ncc.compress_stats(stats, parity)
n_p = jnp.stack([cb.parity_compress_vec(nC[c], parity) for c in range(8)])
d_p = jnp.stack([cb.parity_compress(dC[c], parity) for c in range(8)])
valid = jnp.ones((3,), bool)
t0=time.time()
mv_pal = pn.multiview_cost_pallas(vols_p[parity], counts, s_lo, vol.inv_ds, idx, valid, n_p, d_p, stats_p, params, parity)
c_pal = np.asarray(mv_pal.cost); print("pallas done", round(time.time()-t0,1), flush=True)
t0=time.time()
mv_ref = sv.multiview_cost_svolume(vol, idx, valid, n_p, d_p, stats_p, params, parity=parity)
c_ref = np.asarray(mv_ref.cost); print("sweep done", round(time.time()-t0,1), flush=True)
delta = np.abs(c_ref - c_pal)
sharp = np.minimum(c_ref, c_pal) < 0.99
print("sharp frac", sharp.mean())
print("p50", np.quantile(delta[sharp],0.5), "p99", np.quantile(delta[sharp],0.99), "max", delta[sharp].max())
print("bigflip overall", (delta>0.1).mean())
# per-candidate and per-tile breakdown of big mismatches on SHARP pixels
bad = (delta > 0.02) & sharp
print("bad sharp frac", bad.mean())
if bad.any():
    for c in range(8):
        if bad[c].any():
            ys, xs = np.nonzero(bad[c])
            print(f"cand {c}: n={len(ys)} ty={sorted(set(ys//64))} tx={sorted(set(xs//128))}")
    c0 = np.argmax(bad.reshape(8,-1).sum(1))
    ys, xs = np.nonzero(bad[c0])
    for k in range(min(5, len(ys))):
        y, x = ys[k], xs[k]
        print(f"  c{c0} ({y},{x}): ref {c_ref[c0,y,x]:.4f} pal {c_pal[c0,y,x]:.4f}")
