"""Image sampling primitives.

The reference reads source images through CUDA texture objects with
bilinear filtering and (effectively) clamp-to-edge addressing
(main.cpp:1170-1180; wrap mode is ignored for unnormalized coords). Here
the equivalent is a vectorized bilinear gather: XLA lowers the flat-index
gathers onto fast on-chip access when the image is VMEM-resident, which
the microbenchmarks show runs at ~200 Gsamples/s on v5e for VGA-size
sources.

Exactness note: CUDA's texture filtering quantizes interpolation weights
to 8 bits; we interpolate in full float32 (strictly more accurate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray,
                    y: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W) at float coords (x, y), bilinear, clamp-to-edge.

    Matches `tex2D<float>(t, x + 0.5f, y + 0.5f)` in the reference: the
    +0.5 texel-center convention means integer (x, y) returns the exact
    pixel value.
    """
    H, W = img.shape[-2], img.shape[-1]
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = img.reshape(*img.shape[:-2], H * W)
    i00 = y0i * W + x0i
    i01 = y0i * W + x1i
    i10 = y1i * W + x0i
    i11 = y1i * W + x1i
    v00 = jnp.take(flat, i00, axis=-1)
    v01 = jnp.take(flat, i01, axis=-1)
    v10 = jnp.take(flat, i10, axis=-1)
    v11 = jnp.take(flat, i11, axis=-1)
    top = v00 + (v01 - v00) * fx
    bot = v10 + (v11 - v10) * fx
    return top + (bot - top) * fy


class PackedImage(NamedTuple):
    """Source image with the 4 bilinear corner values pre-packed per
    pixel: data[y*W + x] = (I[y,x], I[y,x+1], I[y+1,x], I[y+1,x+1]),
    edge-clamped.

    One `take` on the packed array fetches a full bilinear stencil, so a
    sample costs 1 gather HLO instead of 4 — same bytes moved, but 4x
    fewer gather ops. That matters because the PatchMatch loop body
    contains hundreds of sample sites (views x window offsets) and XLA's
    TPU compile time scales with HLO count: the unpacked form made the
    full-operating-point program effectively uncompilable.
    """

    data: jnp.ndarray            # (H*W, 4) float32
    height: int
    width: int


def pack_image(img: jnp.ndarray, dtype=None) -> PackedImage:
    """Pack a (H, W) image for bilinear_sample_packed (static shifts).

    dtype=jnp.bfloat16 halves the hot loop's gather traffic; 8-bit
    image intensities (0..255) are exactly representable in bfloat16 and
    interpolation runs in float32 after the fetch."""
    H, W = img.shape
    right = shift_with_edge_clamp(img, 0, 1)
    down = shift_with_edge_clamp(img, 1, 0)
    down_right = shift_with_edge_clamp(img, 1, 1)
    data = jnp.stack([img, right, down, down_right],
                     axis=-1).reshape(H * W, 4)
    if dtype is not None:
        data = data.astype(dtype)
    return PackedImage(data=data, height=H, width=W)


def bilinear_sample_packed(packed: PackedImage, x: jnp.ndarray,
                           y: jnp.ndarray) -> jnp.ndarray:
    """bilinear_sample against a PackedImage: one gather per sample."""
    H, W = packed.height, packed.width
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
    v = jnp.take(packed.data, idx, axis=0).astype(jnp.float32)  # (..., 4)
    top = v[..., 0] + (v[..., 1] - v[..., 0]) * fx
    bot = v[..., 2] + (v[..., 3] - v[..., 2]) * fx
    return top + (bot - top) * fy


def shift_with_edge_clamp(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """img (..., H, W) shifted so out[..., y, x] = img[..., clamp(y+dy),
    clamp(x+dx)] — the static-stencil equivalent of a clamped texture read
    at integer offsets. Pure slices + edge padding; no gathers."""
    H, W = img.shape[-2], img.shape[-1]
    pad_top = max(0, -dy)
    pad_bot = max(0, dy)
    pad_left = max(0, -dx)
    pad_right = max(0, dx)
    pad_widths = [(0, 0)] * (img.ndim - 2) + [(pad_top, pad_bot),
                                              (pad_left, pad_right)]
    padded = jnp.pad(img, pad_widths, mode="edge")
    ys = pad_top + dy
    xs = pad_left + dx
    return padded[..., ys:ys + H, xs:xs + W]
