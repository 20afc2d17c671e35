"""Procedural test scenes (no file IO).

A self-contained Cornell-style box used by tests, benchmarks, and
``__graft_entry__`` so they never depend on external assets. Geometry and
material values mirror the CornellBox-Original layout the reference renders
(scene_assets/models/CornellBox/CornellBox-Original.obj semantics: red/green
side walls, white floor/ceiling/back, two boxes, one warm area light).
"""

from __future__ import annotations

import numpy as np

from pathtracer_tpu.models.camera import Camera
from pathtracer_tpu.models.obj import ObjMaterial, ObjMesh
from pathtracer_tpu.models.pack import pack_scene


def _quad(a, b, c, d):
    """Two triangles for quad a-b-c-d (counter-clockwise winding)."""
    return [(a, b, c), (a, c, d)]


def _box_quads(lo, hi, inward: bool = False):
    """12 triangles for an axis-aligned box; ``inward`` flips winding."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    # Eight corners.
    c = {
        (0, 0, 0): (x0, y0, z0),
        (1, 0, 0): (x1, y0, z0),
        (0, 1, 0): (x0, y1, z0),
        (1, 1, 0): (x1, y1, z0),
        (0, 0, 1): (x0, y0, z1),
        (1, 0, 1): (x1, y0, z1),
        (0, 1, 1): (x0, y1, z1),
        (1, 1, 1): (x1, y1, z1),
    }
    faces = [
        # -z, +z, -x, +x, -y, +y (outward winding)
        _quad(c[0, 0, 0], c[0, 1, 0], c[1, 1, 0], c[1, 0, 0]),
        _quad(c[0, 0, 1], c[1, 0, 1], c[1, 1, 1], c[0, 1, 1]),
        _quad(c[0, 0, 0], c[0, 0, 1], c[0, 1, 1], c[0, 1, 0]),
        _quad(c[1, 0, 0], c[1, 1, 0], c[1, 1, 1], c[1, 0, 1]),
        _quad(c[0, 0, 0], c[1, 0, 0], c[1, 0, 1], c[0, 0, 1]),
        _quad(c[0, 1, 0], c[0, 1, 1], c[1, 1, 1], c[1, 1, 0]),
    ]
    tris = [t for f in faces for t in f]
    if inward:
        tris = [(a, c_, b) for a, b, c_ in tris]
    return tris


def cornell_box_mesh(glossy_tall_box: bool = False) -> ObjMesh:
    """A 36-triangle Cornell-style box (walls, two boxes, area light).

    ``glossy_tall_box``: give the tall box its own Phong-glossy material
    (Ks > 0, Ns = 40 — the reference's glossy lobe parameters,
    program-raymarch.wgsl:262-278) so roughness/specular gradients have a
    visible surface to fit (tests/test_inverse_roughness.py).
    """
    mats = [
        ObjMaterial(name="white", Ns=10, illum=2, Kd=(0.725, 0.71, 0.68)),
        ObjMaterial(name="red", Ns=10, illum=2, Kd=(0.63, 0.065, 0.05)),
        ObjMaterial(name="green", Ns=10, illum=2, Kd=(0.14, 0.45, 0.091)),
        ObjMaterial(
            name="light", Ns=10, illum=2, Kd=(0.78, 0.78, 0.78), Ke=(17.0, 12.0, 4.0)
        ),
    ]
    tall_mat = 0
    if glossy_tall_box:
        tall_mat = len(mats)
        mats.append(
            ObjMaterial(
                name="glossy", Ns=40, illum=2,
                Kd=(0.2, 0.2, 0.2), Ks=(0.6, 0.6, 0.6),
            )
        )
    tris: list[tuple] = []
    mat_ids: list[int] = []

    def add(tlist, mat):
        tris.extend(tlist)
        mat_ids.extend([mat] * len(tlist))

    # Room interior (x in [-1, 1], y in [0, 2], z in [-1, 1]); open front.
    add(_quad((-1, 0, -1), (-1, 0, 1), (1, 0, 1), (1, 0, -1)), 0)  # floor
    add(_quad((-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1)), 0)  # ceiling
    add(_quad((-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1)), 0)  # back
    add(_quad((-1, 0, -1), (-1, 2, -1), (-1, 2, 1), (-1, 0, 1)), 1)  # left red
    add(_quad((1, 0, -1), (1, 0, 1), (1, 2, 1), (1, 2, -1)), 2)  # right green
    # Light quad just below the ceiling, emitting downward: winding chosen
    # so cross(b-a, c-a) points -y (NEE weights contributions by the
    # light-side cosine, so an upward normal blacks out the room).
    add(_quad((-0.24, 1.98, -0.22), (0.23, 1.98, -0.22),
              (0.23, 1.98, 0.16), (-0.24, 1.98, 0.16)), 3)
    # Two boxes.
    add(_box_quads((-0.55, 0.0, -0.55), (0.0, 1.2, -0.05)), tall_mat)  # tall
    add(_box_quads((0.1, 0.0, 0.05), (0.65, 0.6, 0.6)), 0)  # short

    verts: list[tuple] = []
    index: dict[tuple, int] = {}
    faces = []
    for tri in tris:
        ids = []
        for v in tri:
            if v not in index:
                index[v] = len(verts)
                verts.append(v)
            ids.append(index[v])
        faces.append(ids)

    return ObjMesh(
        positions=np.asarray(verts, dtype=np.float64),
        normals=np.zeros((0, 3)),
        faces=np.asarray(faces, dtype=np.int32),
        face_normals=np.full((len(faces), 3), -1, dtype=np.int32),
        face_material=np.asarray(mat_ids, dtype=np.int32),
        materials=mats,
    )


def cornell_box_scene(max_leaf: int = 8, glossy_tall_box: bool = False):
    """(Scene, Camera) for the procedural Cornell box."""
    from pathtracer_tpu.models.scene import _to_device

    packed = pack_scene(
        cornell_box_mesh(glossy_tall_box=glossy_tall_box), max_leaf=max_leaf
    )
    camera = Camera(
        pos=(0.0, 1.0, 3.6),
        up=(0.0, 1.0, 0.0),
        focus=(0.0, 1.0, 0.0),
        height_angle_deg=45.0,
    )
    return _to_device(packed), camera
