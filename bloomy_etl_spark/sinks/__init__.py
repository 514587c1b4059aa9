"""Sinks (SURVEY §2.1 S6-S11, build plan M4).

The reference's sinks are single-process file writes: NetCDF cube with
zlib-5 (``/root/reference/core/pipeline.py:174-177``), per-granule NetCDF
cache (``core/processor.py:358-367``), events JSON
(``core/pipeline.py:167-171``), per-timestamp GeoTIFF export plus index
and style JSON (``core/arcgis.py:30-175``). Here each becomes either a
partitioned columnar write (the scalable path) or a per-partition
foreach/mapInPandas writer where an external format is genuinely required.
"""

from bloomy_etl_spark.sinks.writers import (
    write_cache_partition,
    write_cube,
    write_events_json,
    write_index_json,
    write_style_json,
)
from bloomy_etl_spark.sinks.geotiff import export_geotiff
from bloomy_etl_spark.sinks.netcdf import export_netcdf, read_netcdf_cube

__all__ = [
    "write_cube",
    "write_cache_partition",
    "write_events_json",
    "write_index_json",
    "write_style_json",
    "export_geotiff",
    "export_netcdf",
    "read_netcdf_cube",
]
