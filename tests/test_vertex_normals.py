"""Authored OBJ vertex-normal (vn) channels as shading normals — beyond
reference: psdr-cuda's tinyobjloader parses vn but mesh.cpp:215-274 always
recomputes area-weighted normals; here use_vertex_normals=True opts in.
Geometric normals and silhouette edges stay position-derived."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psdr_tpu.shape.mesh import load_obj

# a unit quad in the z=0 plane whose authored normals tilt +x at x=1
_OBJ = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vn 0.70710678 0 0.70710678
f 1//1 2//2 3//2
f 1//1 3//2 4//1
"""


def _write(tmp_path):
    p = str(tmp_path / "quad_vn.obj")
    with open(p, "w") as f:
        f.write(_OBJ)
    return p


def test_vn_parsed_by_both_parsers(tmp_path):
    p = _write(tmp_path)
    m = load_obj(p, use_vertex_normals=True)
    assert m.normals is not None and m.normals.shape == (2, 3)
    assert m.normal_idx is not None and m.normal_idx.shape == (2, 3)
    np.testing.assert_array_equal(m.normal_idx, [[0, 1, 1], [0, 1, 0]])
    # force the Python fallback and compare
    from psdr_tpu import native
    import psdr_tpu.shape.mesh as mesh_mod
    real = native.obj_load
    native.obj_load = lambda _: None
    try:
        m2 = load_obj(p, use_vertex_normals=True)
    finally:
        native.obj_load = real
    np.testing.assert_allclose(m.normals, m2.normals)
    np.testing.assert_array_equal(m.normal_idx, m2.normal_idx)
    np.testing.assert_array_equal(m.faces, m2.faces)


def test_vn_shading_normals_interpolate_and_transform(tmp_path):
    """The built TriangleInfo carries the authored normals; under a rigid
    to_world rotation they rotate (inverse-transpose = rotation)."""
    from scenes import primitives  # noqa: F401  (sys.path via conftest)
    from psdr_tpu.scene.scene import Scene
    from psdr_tpu.core.records import RenderOptions

    from psdr_tpu.sensor.perspective import PerspectiveCamera
    p = _write(tmp_path)
    m = load_obj(p, use_vertex_normals=True)
    sc = Scene()
    sc.add_mesh(m)
    sc.add_sensor(PerspectiveCamera(fov_x=60.0))
    sc.opts = RenderOptions(width=4, height=4, spp=1)
    flat = sc.build(sc.params())
    # corner normals of face 0: vn0, vn1, vn1
    np.testing.assert_allclose(np.asarray(flat.tri.n0[0]), [0, 0, 1],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(flat.tri.n1[0]),
                               [0.70710678, 0, 0.70710678], atol=1e-6)
    # geometric normal still position-derived
    np.testing.assert_allclose(np.asarray(flat.tri.face_normal[0]),
                               [0, 0, 1], atol=1e-6)

    # rotate 90 deg about y: +z normal -> +x
    from psdr_tpu.core import transform as xform
    m.set_transform(np.asarray(xform.rotate([0, 1, 0], 90.0), np.float32))
    flat2 = sc.build(sc.params())
    np.testing.assert_allclose(np.asarray(flat2.tri.n0[0]), [1, 0, 0],
                               atol=1e-5)


def test_vn_changes_shading_not_silhouette(tmp_path):
    """A lit vn-shaded quad must differ from the recomputed-normal render
    in shading; the silhouette AOV must be identical (edges/geometry are
    position-derived either way)."""
    import dataclasses
    from scenes import cbox_scene
    from psdr_tpu.integrator import FieldExtractionIntegrator

    p = _write(tmp_path)
    from psdr_tpu.scene.scene import Scene
    from psdr_tpu.core.records import RenderOptions
    from psdr_tpu.bsdf.diffuse import Diffuse
    from psdr_tpu.emitter.area import AreaLight
    from psdr_tpu.sensor.perspective import PerspectiveCamera
    from psdr_tpu.core import transform as xform
    from psdr_tpu.shape.mesh import Mesh

    def build_scene(use_vn):
        sc = Scene()
        sc.add_bsdf(Diffuse([0.7, 0.7, 0.7]))
        quad = load_obj(p, use_vertex_normals=use_vn, bsdf_id=0)
        sc.add_mesh(quad)
        light = Mesh(np.array([[-2, -2, 3], [2, -2, 3], [2, 2, 3],
                               [-2, 2, 3]], np.float32),
                     np.array([[0, 2, 1], [0, 3, 2]], np.int32),
                     enable_edges=False, bsdf_id=-1)
        li = sc.add_mesh(light)
        from psdr_tpu.emitter.area import AreaLight
        sc.add_emitter(AreaLight([5.0, 5.0, 5.0], mesh_index=li))
        cam = PerspectiveCamera(fov_x=60.0)
        cam.set_transform(np.asarray(
            xform.look_at([0.5, 0.5, 2.5], [0.5, 0.5, 0.0], [0, 1, 0]),
            np.float32))
        sc.add_sensor(cam)
        sc.opts = RenderOptions(width=24, height=24, spp=16)
        return sc

    from psdr_tpu.integrator import DirectIntegrator
    img_vn = np.asarray(DirectIntegrator(0, 1).renderC(build_scene(True)))
    img_re = np.asarray(DirectIntegrator(0, 1).renderC(build_scene(False)))
    assert not np.allclose(img_vn, img_re, atol=1e-3)

    sil_vn = np.asarray(FieldExtractionIntegrator("silhouette")
                        .renderC(build_scene(True)))
    sil_re = np.asarray(FieldExtractionIntegrator("silhouette")
                        .renderC(build_scene(False)))
    np.testing.assert_allclose(sil_vn, sil_re)


def test_vn_partial_coverage_rejected(tmp_path):
    """Mixed exports (only some corners carry //n) must be rejected when
    use_vertex_normals=True — silently shading the bare corners with
    normals[0] would be wrong with no diagnostic."""
    p = str(tmp_path / "mixed.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\n"
                "f 1//1 2 3//1\n")
    m = load_obj(p)  # fine without the flag
    assert m.normal_idx is not None and (m.normal_idx < 0).any()
    with pytest.raises(ValueError, match="every face corner"):
        load_obj(p, use_vertex_normals=True)
