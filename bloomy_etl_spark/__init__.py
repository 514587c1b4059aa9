"""bloomy_etl_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the capability surface of the reference
ETL pipeline (``TellusOne/bloomy-etl``) as idiomatic Spark: DataFrame/SQL
declarative plans optimized by Catalyst, Arrow-vectorized pandas UDFs for
the few genuinely non-relational edges (raster decode), and Structured
Streaming for unbounded inputs.

Layout:
    session      -- SparkSession factory tuned for local[N] and cluster use
    sources      -- fixture/catalog/raster/cache readers
    functions    -- column-expression libraries (indices, scalars, vectors, text)
    operators    -- relational query corpus + reference-semantics operators
                    (quality gates, merge, event detection, dedup, similarity)
    plans        -- plan-shape inspection helpers (explain assertions)
    sinks        -- parquet/json/geotiff writers
    streaming    -- structured-streaming equivalents of the batch operators
"""

from bloomy_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
