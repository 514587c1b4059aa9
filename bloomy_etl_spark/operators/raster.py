"""Raster warp: reproject/resample tiles onto a fixed destination grid.

Implements the reference's P1 step (``/root/reference/core/processor.py:205-251``:
``rasterio.warp.reproject`` of each band onto one shared ``dst_transform``
grid, bilinear for reflectance bands / nearest for the fmask, with
``src_nodata``→``dst_nodata`` mapping) as a Spark operator:

* one DataFrame row per tile (band raster + affine transform + CRS),
* Arrow-batched ``mapInPandas`` — each task warps whole tiles with
  vectorized NumPy, constant memory per tile,
* engine seam like the PIL decode seam (``operators/multimodal.py``):
  ``engine="auto"`` uses rasterio's full CRS-aware warp when the library
  is importable, and otherwise falls back to the pure-NumPy affine warp
  below, which implements the actual resampling math (inverse-affine
  pixel mapping + bilinear/nearest sampling with nodata exclusion and
  weight renormalization) for the same-CRS case AND the closed-form
  EPSG:4326 ↔ EPSG:3857 (spherical Web Mercator) pair — so both the
  warp computation and the most common web-tiling reprojection are
  REAL and tested in this container, not stubs; only projections that
  need a proj database (UTM zones, datum shifts) require rasterio.

Affine convention (rasterio/GDAL order): ``transform = [a, b, c, d, e, f]``
maps pixel (col, row) to world ``x = a·col + b·row + c``,
``y = d·col + e·row + f``. North-up rasters have ``b = d = 0``, ``e < 0``.

Scale: tiles are independent — the warp is embarrassingly parallel, no
shuffle; at 100 TB the tile table is partitioned by acquisition
date/granule and each task streams its tiles through Arrow. Band arrays
ride as flat ``array<double>`` + (h, w) so Arrow transfers one buffer
per tile instead of h×w rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_SCHEMA = (
    "tile_id string, band string, h int, w int, "
    "transform array<double>, crs string, data array<double>"
)

WARPED_SCHEMA = (
    "tile_id string, band string, h int, w int, "
    "transform array<double>, crs string, data array<double>, "
    "n_valid long"
)


def _invert_affine(t: np.ndarray) -> np.ndarray:
    """Invert [a, b, c, d, e, f]: world (x, y) -> fractional (col, row)."""
    a, b, c, d, e, f = (float(v) for v in t)
    det = a * e - b * d
    if det == 0.0:
        raise ValueError(f"singular affine transform {list(t)}")
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    return np.array([ia, ib, ic, id_, ie, if_], dtype=np.float64)


# --- pure-math CRS conversion (the pairs with closed public formulas) ---
_WEB_MERCATOR_R = 6378137.0  # EPSG:3857 sphere radius, meters


def _lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray):
    """EPSG:4326 → EPSG:3857 (spherical Web Mercator, the standard
    published formulas): x = R·λ, y = R·ln(tan(π/4 + φ/2))."""
    x = _WEB_MERCATOR_R * np.radians(lon)
    y = _WEB_MERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def _mercator_to_lonlat(x: np.ndarray, y: np.ndarray):
    """EPSG:3857 → EPSG:4326: λ = x/R, φ = 2·atan(e^(y/R)) − π/2."""
    lon = np.degrees(x / _WEB_MERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / _WEB_MERCATOR_R)) - np.pi / 2.0)
    return lon, lat


def _crs_code(crs: str) -> str:
    return str(crs).strip().upper()


def numpy_crs_transform(dst_crs: str, src_crs: str):
    """Coordinate transform ``f(x_dst, y_dst) -> (x_src, y_src)`` for the
    CRS pairs with closed-form public math (spherical Web Mercator ↔
    geographic), or ``None`` when the pair needs a projection database
    (rasterio's job). Used by the NumPy warp engine so the single most
    common web-tiling reprojection works without rasterio."""
    a, b = _crs_code(dst_crs), _crs_code(src_crs)
    if a == b:
        return lambda x, y: (x, y)
    if (a, b) == ("EPSG:3857", "EPSG:4326"):
        return _mercator_to_lonlat
    if (a, b) == ("EPSG:4326", "EPSG:3857"):
        return _lonlat_to_mercator
    return None


def _numpy_warp(src: np.ndarray, src_transform, dst_transform,
                dst_shape: tuple[int, int], resampling: str,
                src_nodata: float | None, dst_nodata: float,
                coord_transform=None) -> np.ndarray:
    """Affine warp (optionally across a closed-form CRS pair):
    inverse-map destination pixel centers into source pixel space, then
    sample. ``coord_transform`` converts destination WORLD coordinates
    into source WORLD coordinates between the two affine steps (None =
    same CRS).

    * ``nearest``: the source pixel whose cell contains the mapped point.
    * ``bilinear``: weighted mean of the 4 surrounding source pixel
      CENTERS; source pixels equal to ``src_nodata`` (or NaN, or out of
      bounds) are excluded and the remaining weights renormalized —
      all-invalid neighborhoods produce ``dst_nodata``. This is the
      nodata semantics the reference relies on (nodata never bleeds into
      valid pixels through interpolation).
    """
    dh, dw = dst_shape
    inv = _invert_affine(np.asarray(src_transform, dtype=np.float64))
    a, b, c, d, e, f = (float(v) for v in dst_transform)
    cols = np.arange(dw, dtype=np.float64) + 0.5
    rows = np.arange(dh, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)  # (dh, dw)
    # dst pixel centers in world coords
    x = a * cg + b * rg + c
    y = d * cg + e * rg + f
    if coord_transform is not None:
        x, y = coord_transform(x, y)
    # world -> fractional source pixel units
    colf = inv[0] * x + inv[1] * y + inv[2]
    rowf = inv[3] * x + inv[4] * y + inv[5]

    sh, sw = src.shape
    src = src.astype(np.float64, copy=False)
    invalid_src = np.isnan(src)
    if src_nodata is not None and not np.isnan(src_nodata):
        invalid_src |= src == src_nodata

    if resampling == "nearest":
        j = np.floor(colf).astype(np.int64)
        i = np.floor(rowf).astype(np.int64)
        inb = (j >= 0) & (j < sw) & (i >= 0) & (i < sh)
        out = np.full(dst_shape, dst_nodata, dtype=np.float64)
        jj, ii = j[inb], i[inb]
        vals = src[ii, jj]
        vals = np.where(invalid_src[ii, jj], dst_nodata, vals)
        out[inb] = vals
        return out

    if resampling != "bilinear":
        raise ValueError(f"unknown resampling {resampling!r}")

    # sample at source pixel centers: center of pixel (i, j) sits at
    # fractional (j + 0.5, i + 0.5)
    u = colf - 0.5
    v = rowf - 0.5
    j0 = np.floor(u).astype(np.int64)
    i0 = np.floor(v).astype(np.int64)
    fu = u - j0
    fv = v - i0
    acc = np.zeros(dst_shape, dtype=np.float64)
    wacc = np.zeros(dst_shape, dtype=np.float64)
    for dj, di, wgt in (
        (0, 0, (1 - fu) * (1 - fv)),
        (1, 0, fu * (1 - fv)),
        (0, 1, (1 - fu) * fv),
        (1, 1, fu * fv),
    ):
        j = j0 + dj
        i = i0 + di
        inb = (j >= 0) & (j < sw) & (i >= 0) & (i < sh)
        jj = np.clip(j, 0, sw - 1)
        ii = np.clip(i, 0, sh - 1)
        valid = inb & ~invalid_src[ii, jj]
        w_eff = np.where(valid, wgt, 0.0)
        acc += w_eff * np.where(valid, src[ii, jj], 0.0)
        wacc += w_eff
    out = np.full(dst_shape, dst_nodata, dtype=np.float64)
    ok = wacc > 0.0
    out[ok] = acc[ok] / wacc[ok]
    return out


def _rasterio_warp(src, src_transform, src_crs, dst_transform, dst_crs,
                   dst_shape, resampling, src_nodata, dst_nodata):
    """CRS-aware branch — exercised only where rasterio is installed
    (mirrors the reference call at ``core/processor.py:205-216``)."""
    import rasterio.transform
    from rasterio.warp import Resampling, reproject

    dst = np.full(dst_shape, dst_nodata, dtype=np.float64)
    reproject(
        source=src.astype(np.float64, copy=False),
        destination=dst,
        src_transform=rasterio.transform.Affine(*src_transform),
        src_crs=src_crs,
        dst_transform=rasterio.transform.Affine(*dst_transform),
        dst_crs=dst_crs,
        resampling=Resampling.bilinear if resampling == "bilinear"
        else Resampling.nearest,
        src_nodata=src_nodata,
        dst_nodata=dst_nodata,
    )
    return dst


def _rasterio_available() -> bool:
    try:
        import rasterio  # noqa: F401
        import rasterio.warp  # noqa: F401

        return True
    except ImportError:
        return False


def warp_to_grid(tiles: DataFrame, dst_transform: list[float],
                 dst_width: int, dst_height: int,
                 dst_crs: str = "EPSG:4326",
                 resampling: str = "bilinear",
                 src_nodata: float | None = -9999.0,
                 dst_nodata: float = float("nan"),
                 engine: str = "auto") -> DataFrame:
    """Warp every tile onto one fixed destination grid (the reference's
    shared-``dst_transform`` design: all dates/granules land on the SAME
    pixel indexing, so temporal operators can align by (y, x) without a
    join — ``core/processor.py:180-199``).

    ``engine``: ``"auto"`` → rasterio when importable (full CRS
    reprojection), else the NumPy affine warp (src CRS == ``dst_crs``,
    or the closed-form EPSG:4326 ↔ EPSG:3857 pair); ``"numpy"`` /
    ``"rasterio"`` force a branch. The NumPy branch raises on any other
    CRS mismatch rather than silently treating
    coordinates as compatible.

    Returns WARPED_SCHEMA rows: the destination-grid band + the shared
    transform/crs and a per-tile ``n_valid`` count (pixels not
    ``dst_nodata``) so completeness gates (F13) can run without touching
    the arrays again. With the default NaN ``dst_nodata``, nodata
    elements surface as NULL across the Arrow list boundary — the same
    NaN→NULL convention as P4, and what :func:`tiles_to_pixels` expects.
    """
    if resampling not in ("bilinear", "nearest"):
        raise ValueError(f"unknown resampling {resampling!r}")
    if engine not in ("auto", "numpy", "rasterio"):
        raise ValueError(f"unknown engine {engine!r}")
    dst_t = [float(v) for v in dst_transform]
    dh, dw = int(dst_height), int(dst_width)
    nodata_out = float(dst_nodata)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_rasterio = (
            engine == "rasterio"
            or (engine == "auto" and _rasterio_available())
        )
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                src = np.asarray(row.data, dtype=np.float64).reshape(
                    int(row.h), int(row.w)
                )
                if use_rasterio:
                    warped = _rasterio_warp(
                        src, row.transform, row.crs, dst_t, dst_crs,
                        (dh, dw), resampling, src_nodata, nodata_out,
                    )
                else:
                    ct = numpy_crs_transform(dst_crs, row.crs)
                    if ct is None:
                        raise NotImplementedError(
                            f"tile {row.tile_id}: CRS reprojection "
                            f"{row.crs} -> {dst_crs} needs rasterio "
                            "(not importable here); the NumPy engine "
                            "handles same-CRS affine warps and the "
                            "closed-form EPSG:4326 <-> EPSG:3857 pair"
                        )
                    warped = _numpy_warp(
                        src, row.transform, dst_t, (dh, dw),
                        resampling, src_nodata, nodata_out,
                        coord_transform=None if row.crs == dst_crs else ct,
                    )
                if np.isnan(nodata_out):
                    n_valid = int((~np.isnan(warped)).sum())
                else:
                    n_valid = int((warped != nodata_out).sum())
                out.append(
                    {
                        "tile_id": row.tile_id,
                        "band": row.band,
                        "h": dh,
                        "w": dw,
                        "transform": dst_t,
                        "crs": dst_crs,
                        "data": warped.ravel().tolist(),
                        "n_valid": n_valid,
                    }
                )
            yield pd.DataFrame(out)

    return tiles.mapInPandas(run, schema=WARPED_SCHEMA)


def tiles_to_pixels(warped: DataFrame, value_col: str = "value") -> DataFrame:
    """Explode warped tiles into the engine's pixel model
    ``(tile_id, band, y, x, value)`` with NaN → NULL — the adapter that
    feeds P1 output into the mask/index/merge operators
    (``functions/indices.py``, ``operators/merge.py``).

    Pure JVM expressions (posexplode + integer div/mod); the NaN→NULL
    mapping matches the loaders' masked-pixel convention (P4).
    """
    return (
        warped.select(
            "tile_id", "band", "w",
            F.posexplode("data").alias("pos", "_v"),
        )
        .select(
            "tile_id",
            "band",
            (F.col("pos") / F.col("w")).cast("int").alias("y"),
            F.pmod("pos", F.col("w")).cast("int").alias("x"),
            F.when(~F.isnan("_v"), F.col("_v")).alias(value_col),
        )
    )
