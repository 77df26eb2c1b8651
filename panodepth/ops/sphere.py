"""Lat-long sphere mesh generation (LiteMesh::InitSphere parity).

The reference rasterizes a textured 180x90 lat-long quad sphere through GL
(reference ``SphereMesh.cpp:154-210``; draw call ``SphereMesh.cpp:48``).  The
TPU pipeline replaces rasterization with analytic inverse mapping
(:mod:`panodepth.ops.projection`), so this mesh is not on the hot path — it
exists for geometry parity/debugging (exporting the sphere, measuring the
tessellation error between the mesh-interpolated warp and the analytic one)
and for any consumer that wants the reference's exact vertex layout.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class SphereMesh(NamedTuple):
    vertices: np.ndarray    # (N, 3) unit sphere positions
    texcoords: np.ndarray   # (N, 2) equirect texture coords in [0, 1]
    faces: np.ndarray       # (F, 4) quad vertex indices
    triangles: np.ndarray   # (T, 3) triangulated indices (CreateArrays split)


def init_sphere(latitudes: int = 180, longitudes: int = 90) -> SphereMesh:
    """Reference-exact lat-long quad sphere (SphereMesh.cpp:154-210).

    Vertex (t, p): azimuth = p/(longitudes-1)*2pi, zenith = t/(latitudes-1)*pi
    (both inclusive of the end), position z-up, texcoord = (p, t) normalized.
    Quads are split into triangles the way CreateArrays does
    (SphereMesh.cpp:130-152): per quad, offsets 0 and 2 with wraparound ->
    triangles (0,1,2) and (2,3,0).
    """
    t = np.arange(latitudes, dtype=np.float64)
    p = np.arange(longitudes, dtype=np.float64)
    azimuth = p / (longitudes - 1) * (2 * np.pi)
    zenith = t / (latitudes - 1) * np.pi
    ag, zg = np.meshgrid(azimuth, zenith)  # (lat, lon)
    verts = np.stack(
        [np.sin(zg) * np.cos(ag), np.sin(zg) * np.sin(ag), np.cos(zg)],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    tex = np.stack(
        [np.meshgrid(p / (longitudes - 1), t / (latitudes - 1))[0],
         np.meshgrid(p / (longitudes - 1), t / (latitudes - 1))[1]],
        axis=-1,
    ).reshape(-1, 2).astype(np.float32)

    tt, pp = np.meshgrid(np.arange(latitudes - 1), np.arange(longitudes - 1),
                         indexing="ij")
    i0 = (tt * longitudes + pp).ravel()
    i1 = (tt * longitudes + pp + 1).ravel()
    i2 = ((tt + 1) * longitudes + pp + 1).ravel()
    i3 = ((tt + 1) * longitudes + pp).ravel()
    faces = np.stack([i0, i1, i2, i3], axis=-1).astype(np.int32)
    # CreateArrays: quad (a,b,c,d) -> triangles (a,b,c) and (c,d,a)
    tris = np.concatenate(
        [faces[:, [0, 1, 2]], faces[:, [2, 3, 0]]], axis=0
    ).astype(np.int32)
    return SphereMesh(verts, tex, faces, tris)
