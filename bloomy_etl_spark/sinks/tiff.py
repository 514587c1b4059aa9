"""Pure-Python baseline GeoTIFF encoding (no rasterio/GDAL needed).

The GeoTIFF sink's fallback used to be an ``.npy`` stub; this module
replaces it with a REAL uncompressed float32 GeoTIFF writer built on
stdlib ``struct`` — the TIFF 6.0 container plus the three GeoTIFF tags
(pixel scale / tiepoint / geo-key directory, per the OGC GeoTIFF spec)
and GDAL's nodata tag. Output files are valid multi-sample TIFFs that
rasterio/GDAL/QGIS open directly. ``compression="lzw"`` writes TIFF-LZW
strips (MSB-first bit packing with the spec's early-change convention —
the same choice the reference's ``compress="lzw"`` GeoTIFFs use); the
default stays uncompressed because float32 reflectance data barely
compresses without a predictor.

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


def lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-LZW (spec §13): like GIF LZW but MSB-first bit packing and
    the EARLY-CHANGE convention — code width bumps one code sooner than
    the table size strictly requires (when ``next_code == 2^width - 1``),
    matching every mainstream TIFF codec."""
    clear, eoi = 256, 257
    out = bytearray()
    bitbuf, bitcnt = 0, 0

    def emit(code: int, width: int):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = eoi + 1
    width = 9
    emit(clear, width)
    prefix = b""
    for byte in data:
        trial = prefix + bytes([byte])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        # early change: the encoder's next_code runs ONE AHEAD of the
        # decoder's table (the decoder learns each entry one code later),
        # so the encoder bumps at 2^w - 1 while the decoder bumps at
        # 2^w - 2 — both land on the same emitted code
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = 9
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def lzw_decode_tiff(data: bytes) -> bytes:
    """Inverse of :func:`lzw_encode_tiff` (test aid + fallback reader)."""
    clear, eoi = 256, 257
    bitpos = 0
    width = 9

    def read():
        nonlocal bitpos
        v = 0
        for _ in range(width):
            byte = data[bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read()
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt TIFF-LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # early change, decoder side: one lower threshold than the
        # encoder (see lzw_encode_tiff) because this table lags one
        # entry behind the encoder's at each read
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    return bytes(out)


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
                           nodata: float = -9999.0,
                           compression: str = "none") -> bytes:
    """Encode a (n_bands, H, W) float32 array as an uncompressed GeoTIFF.

    ``transform6`` follows the repo affine convention [a, b, c, d, e, f]
    (x = a·col + b·row + c). North-up grids (b = d = 0) are written as
    ModelPixelScale + ModelTiepoint; rotated grids fall back to the full
    ModelTransformation matrix. ``None`` writes identity scale.
    """
    if compression not in ("none", "lzw"):
        raise ValueError(f"unknown compression {compression!r}")
    arr = np.asarray(bands, dtype="<f4")
    if arr.ndim != 3:
        raise ValueError(f"expected (bands, H, W), got shape {arr.shape}")
    n, h, w = arr.shape
    pixel_data = np.transpose(arr, (1, 2, 0)).tobytes()  # chunky interleave
    if compression == "lzw":
        pixel_data = lzw_encode_tiff(pixel_data)

    a, b, c, d, e, f0 = transform6 if transform6 else (1, 0, 0, 0, -1, 0)
    entries = [
        _entry(256, _LONG, [w]),
        _entry(257, _LONG, [h]),
        _entry(258, _SHORT, [32] * n),
        _entry(259, _SHORT, [5 if compression == "lzw" else 1]),
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
            # TIFF 6.0: out-of-line value offsets must be EVEN. An
            # odd-length blob (e.g. GDAL_NODATA '-999.5\0' = 7 bytes)
            # would shift every later offset — and the pixel strip — to
            # an odd address, so pad each overflow blob to even length.
            padded = packed + b"\0" * (len(packed) % 2)
            overflow.append(padded)
            resolved.append((tag, typ, vals, cursor))
            cursor += len(padded)
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
    if tags[259][0] not in (1, 5) or tags[339][0] != 3:
        raise ValueError("only uncompressed/LZW float32 supported")
    if tags[259][0] == 5:
        raw = lzw_decode_tiff(data[strip_off: strip_off + strip_len])
        flat = np.frombuffer(raw, dtype="<f4", count=h * w * n)
    else:
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
