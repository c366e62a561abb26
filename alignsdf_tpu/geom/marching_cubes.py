"""Marching cubes (vectorized numpy) — replaces skimage's
``marching_cubes_lewiner`` used by the reference (reference utils/mesh.py:354).

Classic 15-case marching cubes with the standard public-domain edge/triangle
tables (Lorensen & Cline via P. Bourke's tabulation).  Vertices are placed by
linear interpolation along cube edges, identical to skimage for non-ambiguous
cells; ambiguous-face resolution differs from Lewiner's topological variant
(documented deviation — metrics like chamfer are insensitive to it).

Fully vectorized: one pass classifies all cells, one gather interpolates all
active edges, vertex dedup via a global edge-id keying so the output mesh is
watertight and index-shared, matching the structure downstream consumers
(largest-connected-component, PLY export, ICP) expect.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from alignsdf_tpu.geom.mc_tables import EDGE_TABLE, TRI_TABLE

# The 12 cube edges as (corner_a, corner_b) with corners indexed
# (i, j, k) bit order: c0=(0,0,0) c1=(1,0,0) c2=(1,1,0) c3=(0,1,0)
#                      c4=(0,0,1) c5=(1,0,1) c6=(1,1,1) c7=(0,1,1)
_EDGE_CORNERS = np.array(
    [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
    np.int64,
)

_CORNER_OFFSETS = np.array(
    [
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    ],
    np.int64,
)


def _edge_global_id(ci: np.ndarray, cj: np.ndarray, ck: np.ndarray,
                    edge: np.ndarray, dims: Tuple[int, int, int]) -> np.ndarray:
    """Unique id per grid edge so shared vertices dedup across cells.

    Every cube edge maps to a canonical (origin voxel, axis) pair:
    axis 0 edges run +i, axis 1 run +j, axis 2 run +k.
    """
    a = _EDGE_CORNERS[edge, 0]
    off_a = _CORNER_OFFSETS[a]
    b = _EDGE_CORNERS[edge, 1]
    off_b = _CORNER_OFFSETS[b]
    lo = np.minimum(off_a, off_b)
    axis = np.argmax(np.abs(off_a - off_b), axis=-1)
    oi = ci + lo[..., 0]
    oj = cj + lo[..., 1]
    ok = ck + lo[..., 2]
    nx, ny, nz = dims
    return ((oi * ny + oj) * nz + ok) * 3 + axis


_native_mc = None


def _load_native():
    global _native_mc
    if _native_mc is not None:
        return _native_mc if _native_mc is not False else None
    import ctypes

    from alignsdf_tpu.native import load_library

    lib = load_library("marching_cubes")
    if lib is None:
        _native_mc = False
        return None
    lib.mc_extract.restype = ctypes.c_int
    lib.mc_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mc_fetch.argtypes = [ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_int64)]
    _native_mc = lib
    return lib


def marching_cubes_native(volume: np.ndarray, level: float,
                          spacing: Tuple[float, float, float]):
    """C++ path (csrc/mc) — ~10x faster than the numpy path at 256^3."""
    import ctypes

    lib = _load_native()
    vol = np.ascontiguousarray(volume, np.float32)
    nx, ny, nz = vol.shape
    n_verts = ctypes.c_int64()
    n_faces = ctypes.c_int64()
    rc = lib.mc_extract(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(level),
        ctypes.c_float(spacing[0]), ctypes.c_float(spacing[1]),
        ctypes.c_float(spacing[2]),
        ctypes.byref(n_verts), ctypes.byref(n_faces),
    )
    if rc != 0:
        raise ValueError("no surface found at the given level")
    verts = np.empty((n_verts.value, 3), np.float32)
    faces = np.empty((n_faces.value, 3), np.int64)
    lib.mc_fetch(verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                 faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return verts, faces


def marching_cubes(
    volume: np.ndarray,
    level: float = 0.0,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of a (nx, ny, nz) scalar field.

    Returns (vertices (V, 3) float32 in index*spacing coordinates,
    faces (F, 3) int64).  Raises ValueError when the surface is empty,
    mirroring skimage's behavior (the reference catches this and warns,
    reference utils/mesh.py:353-358).
    """
    vol = np.asarray(volume, np.float32)
    nx, ny, nz = vol.shape
    if min(nx, ny, nz) < 2:
        raise ValueError("volume must be at least 2^3")

    if _load_native() is not None:
        return marching_cubes_native(vol, level, spacing)

    # corner samples for each cell, shape (nx-1, ny-1, nz-1, 8)
    c = np.empty((nx - 1, ny - 1, nz - 1, 8), np.float32)
    for idx, (di, dj, dk) in enumerate(_CORNER_OFFSETS):
        c[..., idx] = vol[di:di + nx - 1, dj:dj + ny - 1, dk:dk + nz - 1]

    inside = c < level  # skimage/lewiner convention: inside = below level
    cube_index = np.zeros(inside.shape[:3], np.int32)
    for idx in range(8):
        cube_index |= inside[..., idx].astype(np.int32) << idx

    active = (EDGE_TABLE[cube_index] != 0)
    ci, cj, ck = np.nonzero(active)
    if ci.size == 0:
        raise ValueError("no surface found at the given level")

    codes = cube_index[ci, cj, ck]                     # (M,)
    corners = c[ci, cj, ck]                            # (M, 8)

    # gather triangle edge indices: TRI_TABLE is (256, 16) with -1 padding
    tris = TRI_TABLE[codes]                            # (M, 16)
    valid = tris >= 0                                  # (M, 16)
    n_tri_slots = 15                                   # multiple of 3
    tris = tris[:, :n_tri_slots].reshape(-1, 3)        # (M*5, 3)
    tri_valid = valid[:, :n_tri_slots:3].reshape(-1)   # (M*5,) first slot decides

    cell_of_tri = np.repeat(np.arange(ci.size), 5)
    tris = tris[tri_valid]
    cell_of_tri = cell_of_tri[tri_valid]

    # interpolate a vertex on every referenced (cell, edge) pair
    flat_edges = tris.reshape(-1)                      # (T*3,)
    flat_cells = np.repeat(cell_of_tri, 3)

    eid = _edge_global_id(
        ci[flat_cells], cj[flat_cells], ck[flat_cells], flat_edges, (nx, ny, nz)
    )
    uniq, first_idx, inverse = np.unique(eid, return_index=True, return_inverse=True)

    rep_cells = flat_cells[first_idx]
    rep_edges = flat_edges[first_idx]
    ca = _EDGE_CORNERS[rep_edges, 0]
    cb = _EDGE_CORNERS[rep_edges, 1]
    va = corners[rep_cells, ca]
    vb = corners[rep_cells, cb]
    denom = vb - va
    t = np.where(np.abs(denom) > 1e-12, (level - va) / np.where(denom == 0, 1, denom), 0.5)
    t = np.clip(t, 0.0, 1.0)

    base = np.stack([ci[rep_cells], cj[rep_cells], ck[rep_cells]], axis=1).astype(np.float32)
    pa = base + _CORNER_OFFSETS[ca].astype(np.float32)
    pb = base + _CORNER_OFFSETS[cb].astype(np.float32)
    verts = pa + t[:, None] * (pb - pa)
    verts *= np.asarray(spacing, np.float32)[None]

    faces = inverse.reshape(-1, 3)[:, ::-1]  # flip winding: outward normals
    # drop degenerate triangles (can appear when an iso-value hits a corner)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[ok].astype(np.int64)
