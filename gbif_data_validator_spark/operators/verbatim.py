"""J3/S10 — issue→verbatim sample reassembly.

Reference analog: CollectorGroup merges per-issue samples with the full
verbatim rows keyed by lineNumber (collector/CollectorGroup.java:127-167),
emitted as the ≤10-row verbatim record sample ordered by line
(api/result/ValidationDataOutput.java:41-43).

Spark design: take the (already ≤10-per-check) sample keys and join them
back to the source table. The sample side is tiny by construction →
broadcast it and the join is one narrow pass over the source (at 100 TB the
scan is pruned to the sampled partitions when the source is partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import MAX_SAMPLES_PER_CHECK
from .sampling import distinct_first_samples


def verbatim_samples(
    violations: DataFrame,
    source: DataFrame,
    key_col: str = "url",
    max_samples: int = MAX_SAMPLES_PER_CHECK,
    source_cols: list[str] | None = None,
) -> DataFrame:
    """→ up to ``max_samples`` full verbatim source rows per check_id,
    ordered by the stable key (the reference orders by lineNumber)."""
    from ..functions.predicates import non_blank
    from .sampling import top_n_by_key

    # blank keys are not joinable identities (the reference reassembles by
    # unique lineNumber); their evidence already lives in the sample's
    # found/related_data, so they are excluded here. Duplicate keys fan out
    # on the join, so the per-check cap is re-applied after it.
    samples = (
        distinct_first_samples(violations.where(non_blank(F.col("url"))), max_samples)
        .select(F.col("url").alias(key_col), "check_id", "sample_rank")
    )
    cols = source_cols or [c for c in source.columns if c != "html"]
    joined = source.select(*cols).join(F.broadcast(samples), on=key_col, how="inner")
    return top_n_by_key(joined, "check_id", key_col, max_samples)
