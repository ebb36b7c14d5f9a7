"""Native C++ runtime vs pure-Python fallbacks: byte-identical results."""
import numpy as np
import pytest

from psdr_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ unavailable")


OBJ = """\
# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0.5 0.5 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
f 1/1 2/2 5/3
f -4/-4 -1/-1 -2/-3
"""


def test_obj_parser_matches_python(tmp_path):
    fn = tmp_path / "m.obj"
    fn.write_text(OBJ)
    verts, faces, uvs, fuvs, nrms, fnrm = native.obj_load(str(fn))
    assert nrms is None and fnrm is None  # no vn channels in this file
    assert verts.shape == (5, 3)
    # quad fans into 2 tris + 2 single tris
    assert faces.shape == (4, 3)
    np.testing.assert_array_equal(faces[0], [0, 1, 2])
    np.testing.assert_array_equal(faces[1], [0, 2, 3])
    np.testing.assert_array_equal(faces[2], [0, 1, 4])
    # negative indices resolve relative to current counts
    np.testing.assert_array_equal(faces[3], [1, 4, 3])
    assert uvs.shape == (4, 2)
    np.testing.assert_array_equal(fuvs[0], [0, 1, 2])

    # cross-check with the Python parser through load_obj's fallback branch
    import psdr_tpu.native as nat
    import psdr_tpu.shape.mesh as meshmod
    saved = nat.obj_load
    try:
        nat.obj_load = lambda p: None
        m_py = meshmod.load_obj(str(fn))
    finally:
        nat.obj_load = saved
    np.testing.assert_allclose(m_py.vertices, verts)
    np.testing.assert_array_equal(m_py.faces[:3], faces[:3])


def test_edges_match_python():
    rng = np.random.default_rng(0)
    from psdr_tpu.shape import primitives
    m = primitives.make_icosphere(subdiv=2, radius=1.0)
    e_native = native.build_edges(m.faces)

    import psdr_tpu.native as nat
    import psdr_tpu.shape.mesh as meshmod
    saved = nat.build_edges
    try:
        nat.build_edges = lambda f: None
        e_py = meshmod.build_edges(m.faces)
    finally:
        nat.build_edges = saved

    def canon(e):
        e = e.copy()
        # face order within a row may differ; canonicalize (f0<f1 when both)
        both = e[:, 3] >= 0
        swap = both & (e[:, 2] > e[:, 3])
        # swapping faces invalidates opp_vertex; compare sets of (v0,v1,fmin,fmax)
        fmin = np.where(both, np.minimum(e[:, 2], e[:, 3]), e[:, 2])
        fmax = np.where(both, np.maximum(e[:, 2], e[:, 3]), e[:, 3])
        rows = np.stack([e[:, 0], e[:, 1], fmin, fmax], 1)
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_array_equal(canon(e_native), canon(e_py))


def test_edges_reject_nonmanifold():
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 1, 4]], np.int32)
    with pytest.raises(ValueError):
        native.build_edges(faces)


def test_morton_topology_matches_python():
    rng = np.random.default_rng(1)
    n = 500
    p0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    perm, skip, P = native.morton_topology(p0, e1, e2, 4)

    import psdr_tpu.native as nat
    from psdr_tpu.accel import bvh as bvhmod
    saved = nat.morton_topology
    try:
        nat.morton_topology = lambda *a: None
        topo_py = bvhmod.build_bvh_topology(p0, e1, e2, leaf_size=4)
    finally:
        nat.morton_topology = saved

    assert P == topo_py.num_leaves
    np.testing.assert_array_equal(skip, topo_py.skip)
    np.testing.assert_array_equal(perm, topo_py.perm)


# EXR decoding (including PIZ) is tested byte-exactly in tests/test_exr.py;
# the codec is pure numpy (psdr_tpu/core/piz.py), not part of the native lib.
