"""Procedural test scenes shared by the test-suite and benchmarks.

Mirrors the staged configs in BASELINE.json: a diffuse sphere + area light
(config 1) and a Cornell-box-style scene with an occluder (configs 2-4).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from psdr_tpu import (AreaLight, Diffuse, PerspectiveCamera, RenderOptions,
                      Scene)
from psdr_tpu.core import transform as xf
from psdr_tpu.shape import primitives


def sphere_light_scene(width=32, height=32, spp=4, sppe=0, sppse=0,
                       subdiv=1) -> Scene:
    """Diffuse sphere on the z-axis lit by an overhead area light
    (BASELINE.json config 1)."""
    sc = Scene()
    white = sc.add_bsdf(Diffuse([0.8, 0.8, 0.8]), "white")
    grey = sc.add_bsdf(Diffuse([0.5, 0.5, 0.5]), "grey")

    sphere = primitives.make_icosphere(subdiv=subdiv, radius=1.0,
                                       bsdf_id=white)
    sc.add_mesh(sphere)

    floor = primitives.make_quad(size=8.0, bsdf_id=grey, enable_edges=False,
                                 use_face_normals=True)
    floor.set_transform(np.asarray(
        xf.translate([0.0, -1.0, 0.0]) @ xf.rotate([1, 0, 0], -90.0)))
    sc.add_mesh(floor)

    light = primitives.make_quad(size=1.0, bsdf_id=-1,
                                 enable_edges=False, use_face_normals=True)
    light.set_transform(np.asarray(
        xf.translate([0.0, 4.0, 0.0]) @ xf.rotate([1, 0, 0], 90.0)))
    light_idx = sc.add_mesh(light)
    sc.add_emitter(AreaLight([10.0, 10.0, 10.0], mesh_index=light_idx))

    cam = PerspectiveCamera(fov_x=40.0, near=0.1, far=100.0)
    cam.set_transform(np.asarray(xf.look_at([0, 1.5, 6.0], [0, 0, 0], [0, 1, 0])))
    sc.add_sensor(cam)

    sc.opts = RenderOptions(width=width, height=height, spp=spp, sppe=sppe,
                            sppse=sppse)
    return sc


def cbox_scene(width=48, height=48, spp=4, sppe=0, sppse=0,
               occluder_subdiv=1) -> Scene:
    """Cornell-box-style: 5 walls, overhead area light, floating sphere
    occluder (stand-in for the reference's cbox_bunny.xml)."""
    sc = Scene()
    white = sc.add_bsdf(Diffuse([0.95, 0.95, 0.95]), "white")
    red = sc.add_bsdf(Diffuse([0.9, 0.2, 0.2]), "red")
    green = sc.add_bsdf(Diffuse([0.2, 0.9, 0.2]), "green")
    black = sc.add_bsdf(Diffuse([0.0, 0.0, 0.0]), "absorption_only")

    def wall(translate, rotate_axis, rotate_deg, bsdf):
        q = primitives.make_quad(size=1.0, bsdf_id=bsdf, enable_edges=False,
                                 use_face_normals=True)
        m = xf.translate(translate)
        if rotate_deg:
            m = m @ xf.rotate(rotate_axis, rotate_deg)
        q.set_transform(np.asarray(m))
        sc.add_mesh(q)

    wall([0, -1, 0], [1, 0, 0], -90.0, white)   # floor (+y normal)
    wall([0, 1, 0], [1, 0, 0], 90.0, white)     # ceiling
    wall([0, 0, -1], [0, 0, 0], 0.0, white)     # back (+z normal)
    wall([-1, 0, 0], [0, 1, 0], 90.0, red)      # left
    wall([1, 0, 0], [0, 1, 0], -90.0, green)    # right

    sphere = primitives.make_icosphere(subdiv=occluder_subdiv, radius=0.35,
                                       bsdf_id=white)
    sphere.set_transform(np.asarray(xf.translate([0.0, -0.2, 0.0])))
    sc.add_mesh(sphere)

    light = primitives.make_quad(size=0.25, bsdf_id=black,
                                 enable_edges=False, use_face_normals=True)
    light.set_transform(np.asarray(
        xf.translate([0.0, 0.98, 0.0]) @ xf.rotate([1, 0, 0], 90.0)))
    light_idx = sc.add_mesh(light)
    sc.add_emitter(AreaLight([20.0, 20.0, 8.0], mesh_index=light_idx))

    cam = PerspectiveCamera(fov_x=39.0, near=0.01, far=100.0)
    cam.set_transform(np.asarray(xf.look_at([0, 0, 3.6], [0, 0, 0], [0, 1, 0])))
    sc.add_sensor(cam)

    sc.opts = RenderOptions(width=width, height=height, spp=spp, sppe=sppe,
                            sppse=sppse)
    return sc
