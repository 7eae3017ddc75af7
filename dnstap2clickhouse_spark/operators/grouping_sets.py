"""Grouping-set expansion (A2-A5, aggregator.go:240-330).

The reference inserts every event up to three times into ONE aggregation
map, rewriting the key per enabled grouping set and marking rolled-up
dimensions with ``'__ANY__'`` (aggregator.go:32). Streaming Spark cannot
use ``GROUPING SETS``/``cube`` (batch-only), so the idiomatic port is the
reference's own trick expressed declaratively: explode each row into its
enabled key-variant structs, then run a single ``groupBy``. The explode is
narrow (no shuffle); the one shuffle is the downstream aggregation, and
Spark's partial (map-side) aggregation collapses duplicates before it.

At 100 TB this beats running one groupBy per grouping set: one shuffle of
<=3x rows with map-side combine vs three full shuffles of the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import GROUPBY_TAG, AggregatorConfig

def _variant_maps(cfg: AggregatorConfig, question_cols: tuple[str, ...], address_cols: tuple[str, ...]):
    variants: list[dict[str, str]] = []
    if cfg.write_ungrouped:  # grouping set () — aggregator.go:246-253
        variants.append({})
    if cfg.groupby_question:  # set {question} — aggregator.go:254-266
        variants.append({c: GROUPBY_TAG for c in question_cols})
    if cfg.groupby_query_address:  # set {address} — aggregator.go:267-279
        variants.append({c: GROUPBY_TAG for c in address_cols})
    return variants

def expand_grouping_sets(
    df: DataFrame,
    cfg: AggregatorConfig | None = None,
    question_cols: tuple[str, ...] = ("questionName", "questionType"),
    address_cols: tuple[str, ...] = ("queryAddress",),
) -> DataFrame:
    """Explode each row into its enabled grouping-set variants.

    Works identically on batch and streaming DataFrames (explode is a
    stateless narrow transform).
    """
    cfg = cfg or AggregatorConfig()
    variants = _variant_maps(cfg, question_cols, address_cols)
    if not variants:
        return df.limit(0)
    cols = df.columns
    structs = [
        F.struct(
            *[
                (F.lit(repl[c]) if c in repl else F.col(c)).alias(c)
                for c in cols
            ]
        )
        for repl in variants
    ]
    if len(structs) == 1:
        if not variants[0]:
            return df  # only the ungrouped set: identity
        # a single *replacement* variant still needs the __ANY__ rewrite
        # (e.g. write_ungrouped=False with only groupby_question enabled)
        return df.select(
            *[
                (F.lit(variants[0][c]) if c in variants[0] else F.col(c)).alias(c)
                for c in cols
            ]
        )
    return df.select(F.explode(F.array(*structs)).alias("__v")).select("__v.*")

def grouping_sets_sql_union(
    inner_sql: str,
    cfg: AggregatorConfig | None = None,
    question_cols: tuple[str, ...] = ("questionName", "questionType"),
    address_cols: tuple[str, ...] = ("queryAddress",),
) -> str:
    """DuckDB-oracle counterpart: UNION ALL of the enabled variants over an
    inner relation (same row-multiplication semantics as the explode)."""
    cfg = cfg or AggregatorConfig()
    variants = _variant_maps(cfg, question_cols, address_cols)
    parts = []
    for repl in variants:
        # DuckDB's SELECT * REPLACE rewrites rolled-up columns in place
        if repl:
            repl_sql = ", ".join(f"'{GROUPBY_TAG}' AS {c}" for c in repl)
            parts.append(f"SELECT * REPLACE ({repl_sql}) FROM ({inner_sql})")
        else:
            parts.append(f"SELECT * FROM ({inner_sql})")
    return "\nUNION ALL\n".join(parts)
