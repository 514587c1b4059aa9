"""Pure-Python baseline GeoTIFF encoding (no rasterio/GDAL needed).

The GeoTIFF sink's fallback used to be an ``.npy`` stub; this module
replaces it with a REAL uncompressed float32 GeoTIFF writer built on
stdlib ``struct`` — the TIFF 6.0 container plus the three GeoTIFF tags
(pixel scale / tiepoint / geo-key directory, per the OGC GeoTIFF spec)
and GDAL's nodata tag. Output files are valid multi-sample TIFFs that
rasterio/GDAL/QGIS open directly; only LZW compression (patent-simple
but stateful) is left to the rasterio branch.

Layout written (little-endian, single strip):

    header (8) | IFD (2 + n*12 + 4) | out-of-line tag values | pixel data

Pixel data is chunky-interleaved (PlanarConfiguration=1): per pixel, one
float32 per band. A matching minimal reader (:func:`read_geotiff`)
exists so round-trips are testable in containers without any TIFF
library; it is a test aid, not a general TIFF parser.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF type codes
_SHORT, _LONG, _DOUBLE, _ASCII = 3, 4, 12, 2
_TYPE_SIZE = {_SHORT: 2, _LONG: 4, _DOUBLE: 8, _ASCII: 1}
_TYPE_FMT = {_SHORT: "H", _LONG: "I", _DOUBLE: "d"}

# GeoTIFF / GDAL tag ids
TAG_PIXEL_SCALE = 33550
TAG_TIEPOINT = 33922
TAG_TRANSFORMATION = 34264
TAG_GEO_KEYS = 34735
TAG_GDAL_NODATA = 42113

# GeoKeyDirectory for plain EPSG:4326 geographic, pixel-is-area:
#   header (version, rev, minor, nkeys) then (key, location, count, value)
_GEO_KEYS_4326 = (
    1, 1, 0, 3,
    1024, 0, 1, 2,      # GTModelTypeGeoKey = geographic
    1025, 0, 1, 1,      # GTRasterTypeGeoKey = PixelIsArea
    2048, 0, 1, 4326,   # GeographicTypeGeoKey = EPSG:4326
)


def _entry(tag: int, typ: int, values) -> tuple[int, int, list, bytes | None]:
    """Normalize one IFD entry; returns (tag, type, values, packed-or-None).
    Values that fit in the 4-byte inline slot stay inline."""
    if typ == _ASCII:
        data = values.encode("ascii") + b"\0"
        return tag, typ, [len(data)], data if len(data) > 4 else data.ljust(4, b"\0")
    vals = list(values)
    size = _TYPE_SIZE[typ] * len(vals)
    packed = struct.pack("<" + _TYPE_FMT[typ] * len(vals), *vals)
    if size <= 4:
        return tag, typ, vals, packed.ljust(4, b"\0")
    return tag, typ, vals, packed


def encode_geotiff_float32(bands: np.ndarray,
                           transform6: tuple | None = None,
                           nodata: float = -9999.0) -> bytes:
    """Encode a (n_bands, H, W) float32 array as an uncompressed GeoTIFF.

    ``transform6`` follows the repo affine convention [a, b, c, d, e, f]
    (x = a·col + b·row + c). North-up grids (b = d = 0) are written as
    ModelPixelScale + ModelTiepoint; rotated grids fall back to the full
    ModelTransformation matrix. ``None`` writes identity scale.
    """
    arr = np.asarray(bands, dtype="<f4")
    if arr.ndim != 3:
        raise ValueError(f"expected (bands, H, W), got shape {arr.shape}")
    n, h, w = arr.shape
    pixel_data = np.transpose(arr, (1, 2, 0)).tobytes()  # chunky interleave

    a, b, c, d, e, f0 = transform6 if transform6 else (1, 0, 0, 0, -1, 0)
    entries = [
        _entry(256, _LONG, [w]),
        _entry(257, _LONG, [h]),
        _entry(258, _SHORT, [32] * n),
        _entry(259, _SHORT, [1]),            # no compression
        _entry(262, _SHORT, [1]),            # BlackIsZero
        ("STRIP_OFFSETS",),                  # placeholder, patched below
        _entry(277, _SHORT, [n]),
        _entry(278, _LONG, [h]),             # one strip
        _entry(279, _LONG, [len(pixel_data)]),
        _entry(284, _SHORT, [1]),            # chunky
        _entry(339, _SHORT, [3] * n),        # IEEE float samples
    ]
    if b == 0 and d == 0:
        entries.append(_entry(TAG_PIXEL_SCALE, _DOUBLE, [abs(a), abs(e), 0.0]))
        entries.append(
            _entry(TAG_TIEPOINT, _DOUBLE, [0.0, 0.0, 0.0, c, f0, 0.0])
        )
    else:
        # row-major 4x4 model transformation (GeoTIFF spec B.6)
        entries.append(
            _entry(
                TAG_TRANSFORMATION, _DOUBLE,
                [a, b, 0.0, c, d, e, 0.0, f0,
                 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
            )
        )
    entries.append(_entry(TAG_GEO_KEYS, _SHORT, _GEO_KEYS_4326))
    entries.append(_entry(TAG_GDAL_NODATA, _ASCII, repr(float(nodata))))

    # resolve layout: header(8) + IFD + out-of-line values + pixel data
    n_entries = len(entries)
    ifd_size = 2 + n_entries * 12 + 4
    cursor = 8 + ifd_size
    overflow: list[bytes] = []
    resolved = []
    for ent in entries:
        if ent == ("STRIP_OFFSETS",):
            resolved.append((273, _LONG, [0], None))  # patched last
            continue
        tag, typ, vals, packed = ent
        size = len(packed) if packed else 0
        if size > 4:
            overflow.append(packed)
            resolved.append((tag, typ, vals, cursor))
            cursor += size
        else:
            resolved.append((tag, typ, vals, packed))
    data_offset = cursor
    # patch strip offset now that it is known
    resolved = [
        (273, _LONG, [data_offset], struct.pack("<I", data_offset))
        if tag == 273 else (tag, typ, vals, loc)
        for tag, typ, vals, loc in resolved
    ]
    resolved.sort(key=lambda t: t[0])  # TIFF requires ascending tag order

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, 8)
    out += struct.pack("<H", n_entries)
    for tag, typ, vals, loc in resolved:
        count = vals[0] if typ == _ASCII else len(vals)
        out += struct.pack("<HHI", tag, typ, count)
        out += loc if isinstance(loc, bytes) else struct.pack("<I", loc)
    out += struct.pack("<I", 0)  # no next IFD
    for blob in overflow:
        out += blob
    out += pixel_data
    return bytes(out)


def read_geotiff(data: bytes) -> dict:
    """Minimal reader for files written by :func:`encode_geotiff_float32`
    (test aid): returns bands (n, H, W) float32 + the geo tags."""
    if data[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_entries,) = struct.unpack_from("<H", data, ifd_off)
    tags = {}
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from("<HHI", data, off)
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            raw = data[off + 8: off + 8 + size]
        else:
            (voff,) = struct.unpack_from("<I", data, off + 8)
            raw = data[voff: voff + size]
        if typ == _ASCII:
            tags[tag] = raw.rstrip(b"\0").decode("ascii")
        else:
            tags[tag] = list(
                struct.unpack("<" + _TYPE_FMT[typ] * count, raw)
            )
    w, h = tags[256][0], tags[257][0]
    n = tags[277][0]
    (strip_off,), (strip_len,) = tags[273], tags[279]
    if tags[259][0] != 1 or tags[339][0] != 3:
        raise ValueError("only uncompressed float32 supported")
    flat = np.frombuffer(data, dtype="<f4", count=h * w * n, offset=strip_off)
    bands = np.transpose(flat.reshape(h, w, n), (2, 0, 1))
    return {
        "bands": bands,
        "width": w,
        "height": h,
        "n_bands": n,
        "pixel_scale": tags.get(TAG_PIXEL_SCALE),
        "tiepoint": tags.get(TAG_TIEPOINT),
        "transformation": tags.get(TAG_TRANSFORMATION),
        "geo_keys": tags.get(TAG_GEO_KEYS),
        "nodata": float(tags[TAG_GDAL_NODATA]) if TAG_GDAL_NODATA in tags else None,
    }
