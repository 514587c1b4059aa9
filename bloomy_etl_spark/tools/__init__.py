from bloomy_etl_spark.tools.viewer import CubeViewer

__all__ = ["CubeViewer"]
