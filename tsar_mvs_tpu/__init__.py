"""tsar_mvs_tpu — a TPU-native multi-view stereo framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TSAR-MVS
(ZhenlongYuan/TSAR-MVS, Pattern Recognition 2024): checkerboard-PatchMatch
plane-hypothesis MVS, textureless-aware segmentation and correlative
refinement, and multi-view consistency fusion — designed TPU-first:

* per-pixel plane state lives in dense SoA arrays (H, W, ...),
* neighbor-dependent propagation is expressed as parity-masked dense
  stencil updates (red/black checkerboard),
* warped photometric sampling is a vectorized bilinear gather against
  on-chip-resident source images,
* views shard over a `jax.sharding.Mesh` axis; fusion consistency votes
  ride ICI collectives.

Layout:
    geometry    cameras, planes, homographies (reference: cameraGeometryUtils.h)
    ops         compute kernels: NCC cost, checkerboard propagation, WMF,
                SLIC, connected components, Hough (reference: gipuma.cu,
                gSLICr_Lib/)
    models      PatchMatch engine, TSAR refinement pipeline, fusion
                (reference: main.cpp, gipuma.cu driver funcs, Fusion.exe
                contract)
    parallel    mesh/sharding utilities for multi-chip runs
    utils       file I/O (dmb/pfm/ply/cams), synthetic scenes, profiling
"""

__version__ = "0.1.0"

from tsar_mvs_tpu.config import AlgorithmParams  # noqa: F401
