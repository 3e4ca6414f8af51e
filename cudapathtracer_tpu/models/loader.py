"""Scene loading: the ``loadOBJ`` equivalent.

Replicates the reference's loader pipeline (modelLoader.h:125-210): parse
OBJ+MTL, apply a per-call transform ``v*scale + origin``, convert MTL
diffuse -> albedo and emission -> emission, compute face normals from
winding (optionally flipped), detect emissive triangles (emission.r != 0)
into a light list and accumulate total light area. The two loader quirks
are fixed per SURVEY.md §7: no duplicate material push
(modelLoader.h:137-159) and per-face material ids instead of shape-wide
material_ids[0] (modelLoader.h:189).

Uses the native C++ parser (native/obj_loader.cpp via accel.native) when the
shared library is built, else the pure-Python parser — both produce
identical arrays (tested).
"""

from __future__ import annotations

import numpy as np

from .objio import parse_obj
from .scene import Scene, make_scene, merge_scenes


def load_obj(
    path,
    origin=(0.0, 0.0, 0.0),
    scale: float = 1.0,
    flip_normals: bool = False,
    mtl_base_dir=None,
    use_native: bool = True,
) -> Scene:
    """Load one OBJ into a Scene (reference: loadOBJ, modelLoader.h:125)."""
    shapes = materials = None
    if use_native:
        try:
            from ..accel.native import parse_obj_native

            shapes, materials = parse_obj_native(path, mtl_base_dir)
        except Exception:
            shapes = materials = None
    if shapes is None:
        shapes, materials = parse_obj(path, mtl_base_dir)

    albedo = np.array(
        [m.diffuse for m in materials], np.float32
    ).reshape(-1, 3)
    emission = np.array(
        [m.emission for m in materials], np.float32
    ).reshape(-1, 3)
    if albedo.shape[0] == 0:
        # default material for OBJ with no MTL (black, like an untouched
        # materialDesc in the reference)
        albedo = np.zeros((1, 3), np.float32)
        emission = np.zeros((1, 3), np.float32)

    all_verts = []
    all_tris = []
    all_mats = []
    voffset = 0
    for sh in shapes:
        pos = np.asarray(sh.positions, np.float32).reshape(-1, 3)
        pos = pos * np.float32(scale) + np.asarray(origin, np.float32)
        idx = np.asarray(sh.indices, np.int64).reshape(-1, 3) + voffset
        mids = np.asarray(sh.material_ids, np.int64)
        mids = np.where(mids < 0, 0, mids)  # faces with no usemtl -> mat 0
        all_verts.append(pos)
        all_tris.append(idx)
        all_mats.append(mids)
        voffset += pos.shape[0]

    verts = (
        np.concatenate(all_verts) if all_verts else np.zeros((0, 3), np.float32)
    )
    tris = (
        np.concatenate(all_tris).astype(np.int32)
        if all_tris
        else np.zeros((0, 3), np.int32)
    )
    mats = (
        np.concatenate(all_mats).astype(np.int32)
        if all_mats
        else np.zeros((0,), np.int32)
    )
    return make_scene(verts, tris, mats, albedo, emission,
                      flip_normals=flip_normals)


def load_objs(specs) -> Scene:
    """Load several OBJs into one merged scene, like the reference's
    successive loadOBJ calls appending to globals (kernel.cu:591-592).

    specs: iterable of (path, origin, scale) or (path, origin, scale, flip).
    """
    scene = None
    for spec in specs:
        path, origin, scale = spec[0], spec[1], spec[2]
        flip = spec[3] if len(spec) > 3 else False
        s = load_obj(path, origin, scale, flip)
        scene = s if scene is None else merge_scenes(scene, s)
    return scene
