"""Label aggregation for annotation / preference pipelines.

A training-data pipeline that collects human (or model-judge) labels
gets k noisy votes per item and must produce ONE consensus label plus
a confidence the curriculum can threshold on — the majority-vote /
agreement-rate step every RLHF and classification dataset build runs
(Dawid-Skene's zeroth-order special case, and the aggregation Snorkel
calls the majority label model).

Scale design: one hash-agg to (item, label) vote counts — map-side
combinable, so the shuffle carries at most |items|·|label domain|
rows, NOT the raw votes — then a window over the per-item label frame
(bounded by the label domain) picks the winner.  Ties break to the
lexicographically smallest label so every engine replays the same
choice.  Agreement is exact integer millionths (wins·10⁶ div votes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["majority_vote"]


def majority_vote(votes: DataFrame, item_col: str = "item",
                  label_col: str = "label",
                  min_share_e6: int = 0) -> DataFrame:
    """Consensus label per item with exact agreement share.

    Returns ``(item, label, n_votes, n_wins, share_e6, decided)`` —
    one row per item; ``decided`` is false when the winning share (in
    millionths) is below ``min_share_e6`` (the abstain threshold a
    quality gate filters on; the row is still emitted so coverage is
    auditable).
    """
    counts = votes.groupBy(item_col, label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_wins")
    )
    w_item = Window.partitionBy(item_col)
    w_rank = w_item.orderBy(
        F.col("n_wins").desc(), F.col(label_col).asc()
    )
    return (
        counts.withColumn("n_votes", F.sum("n_wins").over(w_item))
        .withColumn("__rn", F.row_number().over(w_rank))
        .filter(F.col("__rn") == 1)
        .select(
            item_col,
            label_col,
            F.col("n_votes").cast("long").alias("n_votes"),
            "n_wins",
            F.expr("(n_wins * 1000000) DIV n_votes").alias("share_e6"),
            (
                F.expr("(n_wins * 1000000) DIV n_votes")
                >= F.lit(min_share_e6)
            ).alias("decided"),
        )
    )
