"""Region RANSAC plane fitting for textureless regions.

Rebuild of the reference's CPU hot loop (main.cpp:1519-1730): per trueweak
region, fit one 3-D plane to the reliable pixels' backprojected points
with 3-point RANSAC under an adaptive inlier threshold, then polish by
random-perturbation annealing.

TPU-native mapping (BASELINE.json north star): the 10 000-iteration
scalar loop becomes batched hypothesis evaluation — all residuals of a
hypothesis batch are one (N, 3) x (3, B) matmul on the MXU — run in
rounds of 1000 so the reference's every-1000-iterations adaptive
threshold schedule (main.cpp:1641-1661) applies at the same granularity.
The annealing hill-climb keeps its sequential accept semantics inside a
`lax.scan`. An optional least-squares polish on the final inlier set
(eigendecomposition of the scatter matrix — the "ORUtils Cholesky
becomes batched jnp.linalg" mapping) improves on the reference's empty
`refinement()` stub (main.cpp:142-145).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

RANSAC_ROUND = 1000


class PlaneFit(NamedTuple):
    plane: jnp.ndarray        # (4,) [a, b, c, d], |(a,b,c)| = 1
    inliers: jnp.ndarray      # () int32 inlier count at final threshold
    threshold: jnp.ndarray    # () final adaptive threshold


def _plane_from_triplet(p1, p2, p3):
    """Plane through 3 points via cross product (calcLinePara,
    main.cpp:147-164), normalized so |(a,b,c)| = 1."""
    n = jnp.cross(p2 - p1, p3 - p1)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    # Degenerate triplets (repeated/collinear points) must not produce the
    # zero plane, which would trivially "inlier" every point (the
    # reference's 0/0 yields NaN residuals with the same no-count effect).
    ok = norm > 1e-12
    n = jnp.where(ok, n / jnp.maximum(norm, 1e-30), 0.0)
    d = jnp.where(ok[..., 0], -jnp.sum(n * p1, axis=-1), jnp.inf)
    return jnp.concatenate([n, d[..., None]], axis=-1)


def _count_inliers(points, valid_f, planes, thr):
    """Inlier counts for a batch of planes: one MXU matmul.

    points: (N, 3); planes: (B, 4); thr: scalar or (B,). -> (B,) f32"""
    resid = jnp.abs(points @ planes[:, :3].T + planes[None, :, 3])  # (N, B)
    inl = (resid < thr).astype(jnp.float32) * valid_f[:, None]
    return jnp.sum(inl, axis=0)


@functools.partial(jax.jit, static_argnames=("iters", "anneal_rounds",
                                             "lsq_polish", "thr_max",
                                             "thr_step"))
def ransac_plane(key: jax.Array, points: jnp.ndarray, valid: jnp.ndarray,
                 depth_abs0: jnp.ndarray, iters: int = 10000,
                 anneal_rounds: int = 1000, lsq_polish: bool = True,
                 thr_max: float = 0.003,
                 thr_step: float = 0.0001) -> PlaneFit:
    """Fit one plane to `points` (N, 3) where `valid` (N,) bool.

    depth_abs0: initial inlier threshold thr_base*sqrt(size//20)
    (main.cpp:1551-1552); the adaptive schedule grows it by thr_step up
    to thr_max (main.cpp:1641-1661).
    """
    N = points.shape[0]
    valid_f = valid.astype(jnp.float32)
    n_valid = jnp.sum(valid_f).astype(jnp.int32)
    total = jnp.maximum(n_valid.astype(jnp.float32), 1.0)

    # Compact valid points to the front so index sampling stays uniform
    # over the valid subset.
    order = jnp.argsort(~valid)  # valid first
    pts = points[order]

    n_rounds = iters // RANSAC_ROUND

    def sample_round(carry, rkey):
        best_plane, best_count, thr = carry
        k1 = rkey
        idx = jax.random.randint(k1, (RANSAC_ROUND, 3), 0,
                                 jnp.maximum(n_valid, 3))
        p1, p2, p3 = (pts[idx[:, 0]], pts[idx[:, 1]], pts[idx[:, 2]])
        planes = _plane_from_triplet(p1, p2, p3)
        counts = _count_inliers(pts, valid_f, planes, thr)
        bi = jnp.argmax(counts)
        better = counts[bi] >= best_count
        best_plane = jnp.where(better, planes[bi], best_plane)
        best_count = jnp.where(better, counts[bi], best_count)

        # Adaptive threshold (main.cpp:1641-1661), applied once per round.
        rat = best_count / total
        grow_small = (rat < 0.3) & (thr < thr_max)
        count2 = _count_inliers(pts, valid_f, best_plane[None],
                                thr + thr_step)[0]
        grow_big = (~grow_small) & (count2 > best_count + 0.02 * total)
        thr = jnp.where(grow_small | grow_big, thr + thr_step, thr)
        best_count = jnp.where(grow_big, count2, best_count)
        return (best_plane, best_count, thr), None

    init = (jnp.array([0.0, 0.0, 1.0, -1.0], jnp.float32),
            jnp.float32(0.0), jnp.asarray(depth_abs0, jnp.float32))
    keys = jax.random.split(jax.random.fold_in(key, 0), n_rounds)
    (plane, count, thr), _ = jax.lax.scan(sample_round, init, keys)

    # Annealing (main.cpp:1667-1711): per round, 4 shrinking scales of
    # uniform perturbation with >=-accept.
    scales = jnp.asarray([2000.0, 200.0, 20.0, 2.0], jnp.float32)

    def anneal_step(carry, rkey):
        plane, count = carry
        ks = jax.random.split(rkey, 4)
        for s in range(4):
            j = scales[s]
            u = jax.random.uniform(ks[s], (4,), jnp.float32)
            # rand() % j - j/2 scaled: abc /10000, d /1000.
            delta = (u * j - j / 2.0) * jnp.asarray(
                [1e-4, 1e-4, 1e-4, 1e-3], jnp.float32)
            cand = plane + delta
            nrm = jnp.sqrt(jnp.sum(cand[:3] * cand[:3]) + 1e-30)
            cand = cand / nrm
            c = _count_inliers(pts, valid_f, cand[None], thr)[0]
            take = c >= count
            plane = jnp.where(take, cand, plane)
            count = jnp.where(take, c, count)
        return (plane, count), None

    akeys = jax.random.split(jax.random.fold_in(key, 1), anneal_rounds)
    (plane, count), _ = jax.lax.scan(anneal_step, (plane, count), akeys)

    if lsq_polish:
        # Total-least-squares plane on the inlier set: smallest
        # eigenvector of the centered scatter matrix.
        resid = jnp.abs(pts @ plane[:3] + plane[3])
        # pts is compacted valid-first, so position < n_valid == valid.
        w = ((resid < thr) & (jnp.arange(N) < n_valid)).astype(jnp.float32)
        wsum = jnp.maximum(jnp.sum(w), 3.0)
        mean = jnp.sum(pts * w[:, None], axis=0) / wsum
        centered = (pts - mean) * w[:, None]
        cov = centered.T @ centered
        evals, evecs = jnp.linalg.eigh(cov)
        n_ls = evecs[:, 0]
        d_ls = -jnp.dot(n_ls, mean)
        cand = jnp.concatenate([n_ls, d_ls[None]])
        c_ls = _count_inliers(pts, valid_f, cand[None], thr)[0]
        take = c_ls >= count
        plane = jnp.where(take, cand, plane)
        count = jnp.where(take, c_ls, count)

    return PlaneFit(plane=plane, inliers=count.astype(jnp.int32),
                    threshold=thr)


def region_points(depth: jnp.ndarray, rays: jnp.ndarray) -> jnp.ndarray:
    """Backproject every pixel to 3-D in the rebased ref frame:
    X = depth * K^-1 p~ (the reference's M_inv(depth*p - P_col4) with
    P_col4 = 0, main.cpp:1573-1591). Returns (H, W, 3)."""
    return depth[..., None] * rays


def initial_threshold(region_size, thr_base: float = 0.0003) -> jnp.ndarray:
    """depth_abs = thr_base * sqrt(size // 20) (main.cpp:1551-1552;
    integer division inside the sqrt as in the reference). A zero-size
    region still gets thr_base as a floor."""
    return thr_base * jnp.maximum(1.0, jnp.sqrt(jnp.floor(
        jnp.asarray(region_size, jnp.float32) / 20.0)))
