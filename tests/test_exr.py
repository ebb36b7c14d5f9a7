"""EXR codec tests: every compression round-trips, and the PIZ/ZIP decode
paths are validated byte-exactly against tinyexr-decoded ground truth of the
reference's own assets (hashes computed once with the vendored tinyexr the
reference uses in src/core/bitmap_loader.cpp:13-53)."""
import hashlib
import os

import numpy as np
import pytest

from psdr_tpu.core.exr import read_exr, write_exr
from psdr_tpu.core import piz

# sha256 of the float32 RGB pixel block as decoded by the reference's
# vendored tinyexr (LoadEXR), i.e. bit-exact decoder parity.
_REF_HASHES = {
    "examples/data/envmaps/ballroom_1k.exr":
        ("4b8b0c148cd7a032cc374894697f917277fcabde56789b927ea2e51d3eda6d71",
         (512, 1024, 3)),  # PIZ, HALF
    "examples/data/textures/test_texture.exr":
        ("729915031dba268f93721b64801780bd6527afea51b837baa9f47b0e560747d7",
         (512, 512, 3)),   # ZIP, HALF
}


@pytest.mark.parametrize("rel", sorted(_REF_HASHES))
def test_reference_asset_decode_bit_exact(rel):
    path = os.path.join("/root/reference", rel)
    if not os.path.exists(path):
        pytest.skip("reference assets not mounted")
    want_hash, want_shape = _REF_HASHES[rel]
    img = read_exr(path)
    assert img.shape == want_shape and img.dtype == np.float32
    assert hashlib.sha256(img.tobytes()).hexdigest() == want_hash


@pytest.mark.parametrize("comp", ["none", "rle", "zips", "zip", "piz",
                                  "pxr24"])
@pytest.mark.parametrize("half", [True, False])
def test_roundtrip_all_compressions(tmp_path, comp, half):
    rng = np.random.default_rng(hash(comp) % 2**31)
    img = (rng.standard_normal((37, 53, 3)) * 10).astype(np.float32)
    img[0, 0, 0] = 0.0
    p = str(tmp_path / f"x_{comp}.exr")
    write_exr(p, img, compression=comp, half=half)
    back = read_exr(p)
    ref = img.astype(np.float16).astype(np.float32) if half else img
    if comp == "pxr24" and not half:
        # PXR24 rounds FLOAT significands to 15 bits by design
        np.testing.assert_allclose(back, ref, rtol=1e-4)
    else:
        np.testing.assert_array_equal(back, ref)


@pytest.mark.parametrize("shape", [(1, 100, 1), (100, 1, 3), (5, 3, 3),
                                   (33, 47, 4), (64, 64, 3)])
def test_piz_awkward_shapes(tmp_path, shape):
    rng = np.random.default_rng(shape[0] * 1000 + shape[1])
    img = (rng.standard_normal(shape) * 4).astype(np.float32)
    p = str(tmp_path / "x.exr")
    for half in (True, False):  # HALF: 1 u16 word/sample; FLOAT: 2 subplanes
        write_exr(p, img, compression="piz", half=half)
        ref = img.astype(np.float16).astype(np.float32) if half else img
        np.testing.assert_array_equal(read_exr(p), ref)


def test_piz_low_entropy_runs(tmp_path):
    # constant regions exercise the Huffman run-length escape symbol
    img = np.zeros((70, 41, 3), np.float32)
    img[10:20, 5:30] = 2.5
    p = str(tmp_path / "runs.exr")
    write_exr(p, img, compression="piz", half=True)
    np.testing.assert_array_equal(read_exr(p), img)


def test_piz_wide_value_range(tmp_path):
    # >2^14 distinct u16 patterns forces the mod-2^16 wavelet flavour
    rng = np.random.default_rng(7)
    img = rng.integers(0, 1 << 16, (128, 160, 3), np.uint16)
    chans = [np.ascontiguousarray(img[:, :, c]) for c in range(3)]
    block = piz.compress_block(chans, [1, 1, 1])
    back = piz.decompress_block(block, [(128, 160, 1)] * 3)
    for c in range(3):
        np.testing.assert_array_equal(back[c], chans[c])


def test_piz_truncated_block_raises():
    img = np.random.default_rng(3).standard_normal((40, 40)).astype(np.float32)
    chans = [np.frombuffer(img.astype(np.float16).tobytes(),
                           np.uint16).reshape(40, 40)]
    block = piz.compress_block(chans, [1])
    for cut in (2, 5, len(block) // 2, len(block) - 1):
        with pytest.raises(ValueError):
            piz.decompress_block(block[:cut], [(40, 40, 1)])


def test_rle_and_pxr24_compress_ratio(tmp_path):
    # sanity: the codecs actually compress compressible data
    img = np.tile(np.linspace(0, 1, 64, dtype=np.float32)[None, :, None],
                  (64, 1, 3))
    raw_size = 64 * 64 * 3 * 2
    for comp in ("rle", "piz", "pxr24"):
        p = str(tmp_path / f"c_{comp}.exr")
        write_exr(p, img, compression=comp, half=True)
        assert os.path.getsize(p) < raw_size
        np.testing.assert_array_equal(
            read_exr(p), img.astype(np.float16).astype(np.float32))
