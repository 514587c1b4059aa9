"""Pure-Python GeoTIFF encoder (sinks/tiff.py): container conformance,
round-trips, geo tags, and independent-decoder read-back when a TIFF
library is importable."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bloomy_etl_spark.sinks.tiff import (
    TAG_GEO_KEYS,
    encode_geotiff_float32,
    read_geotiff,
)


def _rand(n, h, w, seed=3):
    return np.random.default_rng(seed).uniform(-1, 1, (n, h, w)).astype(np.float32)


class TestEncoder:
    def test_roundtrip_values_exact(self):
        arr = _rand(2, 5, 7)
        t6 = (0.25, 0.0, 30.5, 0.0, -0.25, 50.5)
        tif = read_geotiff(encode_geotiff_float32(arr, t6, nodata=-9999.0))
        np.testing.assert_array_equal(tif["bands"], arr)
        assert (tif["width"], tif["height"], tif["n_bands"]) == (7, 5, 2)
        assert tif["pixel_scale"] == [0.25, 0.25, 0.0]
        assert tif["tiepoint"] == [0.0, 0.0, 0.0, 30.5, 50.5, 0.0]
        assert tif["nodata"] == -9999.0
        assert tif["geo_keys"][:4] == [1, 1, 0, 3]

    def test_single_band_and_identity_transform(self):
        arr = _rand(1, 3, 3)
        tif = read_geotiff(encode_geotiff_float32(arr))
        np.testing.assert_array_equal(tif["bands"], arr)
        assert tif["pixel_scale"] == [1.0, 1.0, 0.0]

    def test_rotated_grid_uses_model_transformation(self):
        arr = _rand(1, 2, 2)
        t6 = (0.5, 0.1, -3.0, -0.2, -0.5, 7.0)  # rotation terms set
        tif = read_geotiff(encode_geotiff_float32(arr, t6))
        assert tif["pixel_scale"] is None
        m = tif["transformation"]
        assert m[0] == 0.5 and m[1] == 0.1 and m[3] == -3.0
        assert m[4] == -0.2 and m[5] == -0.5 and m[7] == 7.0
        assert m[15] == 1.0

    def test_tag_order_ascending(self):
        """TIFF 6.0 requires IFD entries sorted by tag id — some readers
        reject unsorted IFDs outright."""
        data = encode_geotiff_float32(_rand(2, 4, 4))
        (ifd_off,) = struct.unpack_from("<I", data, 4)
        (n,) = struct.unpack_from("<H", data, ifd_off)
        tags = [
            struct.unpack_from("<H", data, ifd_off + 2 + i * 12)[0]
            for i in range(n)
        ]
        assert tags == sorted(tags)
        assert TAG_GEO_KEYS in tags

    def test_odd_length_nodata_keeps_offsets_even(self):
        """TIFF 6.0: out-of-line value offsets must be even. nodata=-999.5
        stringifies to 7 bytes ('-999.5\\0') — without pad bytes every
        later offset and the pixel strip would land at odd addresses
        (ADVICE r4; the default -9999.0 is even-length, masking this)."""
        arr = _rand(2, 5, 7)
        data = encode_geotiff_float32(
            arr, (0.25, 0.0, 30.5, 0.0, -0.25, 50.5), nodata=-999.5
        )
        (ifd_off,) = struct.unpack_from("<I", data, 4)
        (n,) = struct.unpack_from("<H", data, ifd_off)
        from bloomy_etl_spark.sinks.tiff import _TYPE_SIZE

        for i in range(n):
            off = ifd_off + 2 + i * 12
            tag, typ, count = struct.unpack_from("<HHI", data, off)
            if _TYPE_SIZE[typ] * count > 4:
                (voff,) = struct.unpack_from("<I", data, off + 8)
                assert voff % 2 == 0, f"tag {tag} value at odd offset {voff}"
        tif = read_geotiff(data)
        np.testing.assert_array_equal(tif["bands"], arr)
        assert tif["nodata"] == -999.5

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            encode_geotiff_float32(np.zeros((4, 4), dtype=np.float32))

    def test_magic_and_strip_bounds(self):
        arr = _rand(2, 3, 4)
        data = encode_geotiff_float32(arr)
        assert data[:4] == b"II\x2a\x00"
        tif = read_geotiff(data)
        # strip payload is the final bytes of the file, exactly sized
        assert len(data) >= 2 * 3 * 4 * 4
        np.testing.assert_array_equal(
            tif["bands"].transpose(1, 2, 0).ravel().view("<f4"),
            np.frombuffer(data[-2 * 3 * 4 * 4:], dtype="<f4"),
        )


def _pil_tiff_available():
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _pil_tiff_available(), reason="PIL not importable")
def test_independent_decoder_reads_it():  # pragma: no cover - PIL absent here
    import io

    from PIL import Image

    arr = _rand(1, 6, 6)
    img = Image.open(io.BytesIO(encode_geotiff_float32(arr)))
    got = np.asarray(img)
    np.testing.assert_allclose(got, arr[0], rtol=1e-7)


class TestLzwCompression:
    def test_lzw_roundtrip_random_and_repetitive(self):
        from bloomy_etl_spark.sinks.tiff import lzw_decode_tiff, lzw_encode_tiff

        rng = np.random.default_rng(9)
        for payload in (
            b"",
            b"A" * 5000,                      # repetitive: must shrink
            rng.integers(0, 256, 40000, dtype=np.uint8).tobytes(),  # width growth + reset
            bytes(range(256)) * 3,
        ):
            enc = lzw_encode_tiff(payload)
            assert lzw_decode_tiff(enc) == payload
        assert len(lzw_encode_tiff(b"A" * 5000)) < 500

    def test_lzw_geotiff_roundtrip(self):
        arr = _rand(2, 16, 16, seed=11)
        data = encode_geotiff_float32(arr, compression="lzw")
        plain = encode_geotiff_float32(arr)
        tif = read_geotiff(data)
        np.testing.assert_array_equal(tif["bands"], arr)
        # constant rasters: LZW beats the uncompressed encoding
        const = np.zeros((2, 64, 64), dtype=np.float32)
        assert len(encode_geotiff_float32(const, compression="lzw")) < len(
            encode_geotiff_float32(const)
        ) / 4
        with pytest.raises(ValueError):
            encode_geotiff_float32(arr, compression="deflate")
