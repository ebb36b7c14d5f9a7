"""XML scene loader + EXR codec tests (self-contained assets in tmpdir)."""
import os

import numpy as np
import jax
import pytest

from psdr_tpu import DirectIntegrator, load_file, load_integrator, load_string
from psdr_tpu.core.exr import read_exr, write_exr


QUAD_OBJ = """\
v -1 -1 0
v 1 -1 0
v 1 1 0
v -1 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3
f 1/1 3/3 4/4
"""

SCENE_XML = """\
<scene version="0.5.0">
  <integrator type="direct">
    <integer name="bsdf_samples" value="2"/>
    <integer name="emitter_samples" value="2"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="to_world">
      <lookat origin="0, 0, 4" target="0, 0, 0" up="0, 1, 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="32"/>
      <integer name="height" value="32"/>
    </film>
  </sensor>
  <bsdf type="diffuse" id="tex">
    <texture name="reflectance" type="bitmap">
      <string name="filename" value="tex.exr"/>
    </texture>
  </bsdf>
  <bsdf type="diffuse" id="black">
    <rgb name="reflectance" value="0.0, 0.0, 0.0"/>
  </bsdf>
  <bsdf type="roughconductor" id="metal">
    <float name="alpha" value="0.1"/>
    <rgb name="eta" value="0.15, 0.11, 0.13"/>
    <rgb name="k" value="4.8, 3.1, 2.1"/>
  </bsdf>
  <shape type="obj">
    <string name="filename" value="quad.obj"/>
    <boolean name="face_normals" value="true"/>
    <ref id="tex"/>
  </shape>
  <shape type="obj">
    <string name="filename" value="quad.obj"/>
    <transform name="to_world">
      <scale value="0.3"/>
      <rotate x="1" angle="180"/>
      <translate x="1.4" y="1.4" z="2.5"/>
    </transform>
    <boolean name="face_normals" value="true"/>
    <ref id="black"/>
    <emitter type="area">
      <rgb name="radiance" value="10, 10, 10"/>
    </emitter>
  </shape>
</scene>
"""


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    (d / "quad.obj").write_text(QUAD_OBJ)
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4] = [0.9, 0.1, 0.1]
    tex[:, 4:] = [0.1, 0.1, 0.9]
    write_exr(str(d / "tex.exr"), tex)
    (d / "scene.xml").write_text(SCENE_XML)
    return d


def test_exr_half_roundtrip(tmp_path):
    img = np.random.rand(17, 23, 3).astype(np.float32)
    write_exr(str(tmp_path / "x.exr"), img, half=True)
    back = read_exr(str(tmp_path / "x.exr"))
    np.testing.assert_allclose(back, img, atol=1e-2)


def test_load_and_render(scene_dir):
    sc = load_file(str(scene_dir / "scene.xml"))
    assert sc.opts.width == 32 and sc.opts.spp == 4
    assert len(sc.meshes) == 2 and len(sc.bsdfs) == 3
    assert len(sc.emitters) == 1 and len(sc.sensors) == 1
    assert "BSDF[id=tex]" in sc.param_map
    assert "Mesh[0]" in sc.param_map

    integ = load_integrator(sc)
    assert isinstance(integ, DirectIntegrator)
    assert integ.bsdf_samples == 2 and integ.light_samples == 2

    img = np.asarray(integ.renderC(sc, seed=0))
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img))
    # the textured quad faces the camera: left half red-ish, right blue-ish
    left = img[12:20, 4:12]
    right = img[12:20, 20:28]
    assert left[..., 0].mean() > left[..., 2].mean()
    assert right[..., 2].mean() > right[..., 0].mean()


def test_transform_composition(scene_dir):
    sc = load_string((scene_dir / "scene.xml").read_text(),
                     base_dir=str(scene_dir))
    # light quad: scale 0.3 then rotate then translate to (1.4, 1.4, 2.5)
    m = sc.meshes[1]
    vp = np.asarray(m.world_positions(m.params()))
    assert np.allclose(vp[:, 2], 2.5, atol=1e-5)
    assert np.allclose(np.abs(vp[:, 0] - 1.4).max(), 0.3, atol=1e-5)


def test_reference_scene_if_available():
    """Load one of the reference's own scene files (tree.xml is the only one
    whose OBJ assets are all committed upstream)."""
    ref = "/root/reference/examples/data/scenes/tree.xml"
    if not os.path.exists(ref):
        pytest.skip("reference assets not mounted")
    sc = load_file(ref, auto_configure=False)
    assert len(sc.meshes) == 3
    assert sc.opts.width == 256 and sc.opts.spp == 64
    assert len(sc.emitters) == 1
    total_faces = sum(m.num_faces for m in sc.meshes)
    assert total_faces > 10000  # the tree
    sc.configure()
    assert sc.flat.tri.p0.shape[0] == total_faces


@pytest.mark.slow
def test_all_reference_scenes_load_and_render():
    """Load every scene XML the reference ships and render the ones whose
    OBJ/EXR assets are complete upstream. The four bunny scenes reference
    ./data/objects/bunny/bunny.obj which the reference repo does NOT
    commit (only bunny_low.obj, ~15x larger, exists) — those must still
    parse and render finite with the substitute asset; the two complete
    scenes (bunny_env_2, tree) must render non-black."""
    import dataclasses
    import numpy as np
    from psdr_tpu.integrator import DirectIntegrator

    base = "/root/reference/examples/data/scenes"
    if not os.path.isdir(base):
        pytest.skip("reference assets not mounted")
    complete = {"bunny_env_2.xml", "tree.xml"}
    for name in ("bunny.xml", "bunny_env.xml", "bunny_env_2.xml",
                 "cbox_bunny.xml", "cbox_bunny_mutiemitter.xml", "tree.xml"):
        xml = open(os.path.join(base, name)).read()
        xml = xml.replace("./data", base + "/..")
        xml = xml.replace("bunny/bunny.obj", "bunny/bunny_low.obj")
        sc = load_string(xml, base_dir=base)
        sc.opts = dataclasses.replace(sc.opts, width=48, height=27, spp=2)
        img = np.asarray(DirectIntegrator(1, 1).renderC(sc))
        assert np.isfinite(img).all(), name
        if name in complete:
            assert img.mean() > 0.01, f"{name} rendered black"
        if "mutiemitter" in name:
            assert len(sc.emitters) >= 2  # exercises emitter selection
