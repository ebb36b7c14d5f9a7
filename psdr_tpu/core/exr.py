"""Minimal OpenEXR scanline codec (numpy): read/write NONE, ZIPS, ZIP.

Replaces the reference's vendored tinyexr + miniz (~18k LoC;
src/core/bitmap_loader.cpp:13-53 ``load_openexr_rgba``) with a compact
implementation of the subset a differentiable renderer needs: RGB(A)/Y
scanline images, HALF or FLOAT channels, zlib-family compression. PIZ
(wavelet) inputs are detected and reported with a clear error.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = 0x01312F76
_PIXEL_TYPES = {0: np.uint32, 1: np.float16, 2: np.float32}
_COMPRESSION_NAMES = {0: "none", 1: "rle", 2: "zips", 3: "zip", 4: "piz",
                      5: "pxr24", 6: "b44", 7: "b44a", 8: "dwaa", 9: "dwab"}
_LINES_PER_BLOCK = {0: 1, 2: 1, 3: 16, 4: 32}


def _read_attrs(buf: memoryview, pos: int):
    attrs = {}
    while True:
        end = bytes(buf[pos:pos + 256]).index(b"\0") + pos
        name = bytes(buf[pos:end]).decode()
        pos = end + 1
        if not name:
            return attrs, pos
        end = bytes(buf[pos:pos + 256]).index(b"\0") + pos
        typ = bytes(buf[pos:end]).decode()
        pos = end + 1
        size = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        attrs[name] = (typ, bytes(buf[pos:pos + size]))
        pos += size


def _parse_channels(raw: bytes):
    chans = []
    pos = 0
    while raw[pos] != 0:
        end = raw.index(b"\0", pos)
        name = raw[pos:end].decode()
        pos = end + 1
        ptype, _lin, _xs, ys = struct.unpack_from("<IIII", raw, pos)
        # layout: pixel_type(4) pLinear+reserved(4) xSampling(4) ySampling(4)
        pos += 16
        chans.append((name, _PIXEL_TYPES[ptype]))
    return chans


def _unpredict(data: bytearray) -> bytes:
    """OpenEXR zip reconstruction: byte-delta decode then de-interleave."""
    arr = np.frombuffer(bytes(data), np.uint8).astype(np.int64)
    arr[1:] -= 128
    arr = np.cumsum(arr).astype(np.uint8)
    n = arr.shape[0]
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = arr[:half]
    out[1::2] = arr[half:]
    return out.tobytes()


def _predict(data: bytes) -> bytes:
    arr = np.frombuffer(data, np.uint8)
    n = arr.shape[0]
    half = (n + 1) // 2
    inter = np.concatenate([arr[0::2], arr[1::2]])
    d = inter.astype(np.int64)
    d[1:] = d[1:] - d[:-1] + 128
    return d.astype(np.uint8).tobytes()


def read_exr(path: str) -> np.ndarray:
    """Load a scanline EXR as float32 (H, W, C); channel order RGB(A) or Y."""
    with open(path, "rb") as f:
        data = memoryview(f.read())
    magic, version = struct.unpack_from("<II", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"{path}: not an OpenEXR file")
    if version & 0x200:
        raise ValueError(f"{path}: tiled EXR not supported")
    attrs, pos = _read_attrs(data, 8)

    comp = attrs["compression"][1][0]
    if comp == 4:
        from .. import native
        if not native.available():
            raise ValueError(f"{path}: piz decoding requires the native "
                             "library (g++ not available)")
    elif comp not in _LINES_PER_BLOCK:
        raise ValueError(
            f"{path}: {_COMPRESSION_NAMES.get(comp, comp)} compression not "
            "supported (supported: none, zips, zip, piz)")
    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"][1])
    width, height = x1 - x0 + 1, y1 - y0 + 1
    chans = _parse_channels(attrs["channels"][1])  # alphabetical in file

    lines_pb = _LINES_PER_BLOCK[comp]
    n_blocks = -(-height // lines_pb)
    pos += 8 * n_blocks  # skip offset table; blocks are sequential

    bytes_per_line = sum(np.dtype(t).itemsize for _, t in chans) * width
    planes = {name: np.empty((height, width), np.float32) for name, _ in chans}
    for _ in range(n_blocks):
        y, size = struct.unpack_from("<iI", data, pos)
        pos += 8
        raw = bytes(data[pos:pos + size])
        pos += size
        ny = min(lines_pb, y1 - y + 1)
        expect = bytes_per_line * ny
        if comp == 4:
            if size < expect:
                from .. import native
                sizes = [np.dtype(t).itemsize // 2 for _, t in chans]
                u16 = native.piz_decode(raw, [width] * len(chans),
                                        [ny] * len(chans), sizes)
                off16 = 0
                for (name, typ), sz in zip(chans, sizes):
                    n16 = width * ny * sz
                    plane = u16[off16:off16 + n16]
                    if typ is np.float16:
                        vals = plane.view(np.float16).reshape(ny, width)
                    else:
                        vals = plane.tobytes()
                        vals = np.frombuffer(vals, typ).reshape(ny, width)
                    planes[name][y - y0:y - y0 + ny] = vals.astype(np.float32)
                    off16 += n16
            else:  # stored raw (incompressible block): scanline interleave
                off = 0
                for line in range(ny):
                    for name, typ in chans:
                        nb = np.dtype(typ).itemsize * width
                        vals = np.frombuffer(raw[off:off + nb], typ)
                        planes[name][y - y0 + line] = vals.astype(np.float32)
                        off += nb
            continue
        if comp != 0 and size < expect:
            raw = _unpredict(bytearray(zlib.decompress(raw)))
        # per scanline: channels in file order, plane-contiguous
        off = 0
        for line in range(ny):
            for name, typ in chans:
                nb = np.dtype(typ).itemsize * width
                vals = np.frombuffer(raw[off:off + nb], typ)
                planes[name][y - y0 + line] = vals.astype(np.float32)
                off += nb
    names = [n for n, _ in chans]
    for order in ("RGBA", "RGB", "Y"):
        if sorted(order) == sorted(names):
            return np.stack([planes[c] for c in order], axis=-1)
    return np.stack([planes[c] for c in sorted(names)], axis=-1)


def write_exr(path: str, img: np.ndarray, compression: str = "zip",
              half: bool = False) -> None:
    """Write (H, W, C) float array; C in {1 (Y), 3 (RGB), 4 (RGBA)}."""
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    height, width, nc = img.shape
    names = {1: ["Y"], 3: ["B", "G", "R"], 4: ["A", "B", "G", "R"]}[nc]
    src = {1: {"Y": 0}, 3: {"R": 0, "G": 1, "B": 2},
           4: {"R": 0, "G": 1, "B": 2, "A": 3}}[nc]
    dtype = np.float16 if half else np.float32
    ptype = 1 if half else 2
    comp_id = {"none": 0, "zips": 2, "zip": 3}[compression]
    lines_pb = _LINES_PER_BLOCK[comp_id]

    def attr(name, typ, val):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + struct.pack("<I", len(val)) + val)

    chan_raw = b"".join(
        n.encode() + b"\0" + struct.pack("<IIII", ptype, 0, 1, 1)
        for n in names) + b"\0"
    dw = struct.pack("<4i", 0, 0, width - 1, height - 1)
    header = struct.pack("<II", _MAGIC, 2)
    header += attr("channels", "chlist", chan_raw)
    header += attr("compression", "compression", bytes([comp_id]))
    header += attr("dataWindow", "box2i", dw)
    header += attr("displayWindow", "box2i", dw)
    header += attr("lineOrder", "lineOrder", b"\0")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    n_blocks = -(-height // lines_pb)
    blocks = []
    for b in range(n_blocks):
        y = b * lines_pb
        ny = min(lines_pb, height - y)
        raw = b"".join(
            img[y + line, :, src[n]].astype(dtype).tobytes()
            for line in range(ny) for n in names)
        if comp_id != 0:
            packed = zlib.compress(_predict(raw))
            if len(packed) >= len(raw):
                packed = raw
        else:
            packed = raw
        blocks.append((y, packed))

    out = bytearray(header)
    table_pos = len(out)
    out += b"\0" * (8 * n_blocks)
    offsets = []
    for y, packed in blocks:
        offsets.append(len(out))
        out += struct.pack("<iI", y, len(packed)) + packed
    for i, off in enumerate(offsets):
        struct.pack_into("<Q", out, table_pos + 8 * i, off)
    with open(path, "wb") as f:
        f.write(bytes(out))
