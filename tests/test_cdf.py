"""Pure-Python NetCDF3 classic encoder (sinks/cdf.py)."""

from __future__ import annotations

import numpy as np
import pytest

from bloomy_etl_spark.sinks.cdf import encode_netcdf3, read_netcdf3


class TestCdf:
    def test_roundtrip_two_vars_shared_dims(self):
        rng = np.random.default_rng(5)
        ndvi = rng.uniform(-1, 1, (4, 6)).astype(np.float32)
        evi = rng.uniform(-1, 1, (4, 6)).astype(np.float32)
        ndvi[1, 2] = np.nan
        data = encode_netcdf3(
            {"ndvi": (("y", "x"), ndvi), "evi": (("y", "x"), evi)},
            global_attrs={"date": "2024-06-01", "crs": "EPSG:4326"},
        )
        assert data[:4] == b"CDF\x01"
        nc = read_netcdf3(data)
        assert nc["dims"] == {"y": 4, "x": 6}
        assert nc["attrs"]["date"] == "2024-06-01"
        np.testing.assert_array_equal(nc["vars"]["ndvi"], ndvi)
        np.testing.assert_array_equal(nc["vars"]["evi"], evi)
        assert nc["vars"]["ndvi"].dtype == np.dtype(">f4")

    def test_mixed_dtypes_and_1d(self):
        t = np.array([1.5, 2.5], dtype=np.float64)
        k = np.arange(6, dtype=np.int32).reshape(2, 3)
        nc = read_netcdf3(encode_netcdf3(
            {"t": (("n",), t), "k": (("n", "m"), k)}
        ))
        np.testing.assert_array_equal(nc["vars"]["t"], t)
        np.testing.assert_array_equal(nc["vars"]["k"], k)

    def test_odd_name_padding(self):
        # names whose lengths exercise 4-byte padding
        arr = np.ones((3,), dtype=np.float32)
        nc = read_netcdf3(encode_netcdf3({"abc": (("dim_x_long",), arr)},
                                         global_attrs={"a": "z"}))
        assert nc["dims"] == {"dim_x_long": 3}
        np.testing.assert_array_equal(nc["vars"]["abc"], arr)

    def test_errors(self):
        arr = np.ones((2, 2), dtype=np.float32)
        with pytest.raises(ValueError):
            encode_netcdf3({"v": (("y",), arr)})  # ndim mismatch
        with pytest.raises(ValueError):
            encode_netcdf3({
                "v": (("y", "x"), arr),
                "w": (("y",), np.ones(3, dtype=np.float32)),
            })  # dim size conflict
        with pytest.raises(ValueError):
            encode_netcdf3({"v": (("y", "x"), arr.astype(np.int16))})
        with pytest.raises(ValueError):
            read_netcdf3(b"not a cdf file")


def _xr_available():
    try:
        import xarray  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _xr_available(), reason="xarray not importable")
def test_independent_decoder_reads_it():  # pragma: no cover - xr absent here
    import tempfile

    import xarray as xr

    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    data = encode_netcdf3({"v": (("y", "x"), arr)}, {"crs": "EPSG:4326"})
    with tempfile.NamedTemporaryFile(suffix=".nc") as f:
        f.write(data)
        f.flush()
        ds = xr.open_dataset(f.name)
        np.testing.assert_array_equal(ds["v"].to_numpy(), arr)
        assert ds.attrs["crs"] == "EPSG:4326"
