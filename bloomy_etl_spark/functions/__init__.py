from bloomy_etl_spark.functions.indices import (
    QualityThresholds,
    DEFAULT_QUALITY,
    with_masks,
    with_indices,
)

__all__ = ["QualityThresholds", "DEFAULT_QUALITY", "with_masks", "with_indices"]
