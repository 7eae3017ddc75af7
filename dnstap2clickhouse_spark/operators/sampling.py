"""F6/O4: bitmask sampling on the DNS id.

Reference: ``isSample`` keeps a row iff ``(dnsId & mask) == (match & mask)``
(aggregator.go:332-337); mask 0 passes everything. The adaptive controller
(``tuneMask``, aggregator.go:455-483) widens/narrows the mask to hold the
sample count in a 32-256 band — pure load shedding for its unbounded join
state. Spark bounds join state by watermark, so the controller is
deliberately replaced by a *static* mask (deterministic, oracle-testable);
rate-only sampling is available via ``DataFrame.sample``. Documented delta:
SURVEY.md section 2.7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def sample_by_dns_id(df: DataFrame, mask: int, match: int, id_col: str = "id") -> DataFrame:
    if mask == 0:
        return df
    return df.filter(F.col(id_col).bitwiseAND(F.lit(mask)) == F.lit(match & mask))

def sample_by_dns_id_sql(inner_sql: str, mask: int, match: int, id_col: str = "id") -> str:
    if mask == 0:
        return inner_sql
    return f"SELECT * FROM ({inner_sql}) WHERE ({id_col} & {mask}) = {match & mask}"
