"""Text analysis for training-data pipelines over ``documents``.

Everything stays JVM-side (built-in string/array functions — no Python
UDFs in the hot path): token counting, quality scoring, language-ID
heuristic, and document fingerprinting (md5 + polynomial rolling hash).

Determinism rules: ratios divide exact integers (bit-identical across
engines); the rolling hash folds left-to-right mod 2^31-1 in both
dialects.

Scale note: all are narrow per-row transforms — no shuffle at all except
the final ORDER BY used for stable test output; at 100 TB these run as a
single mapper stage fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table

#: heuristic English markers (must exist in the corpus vocabulary)
STOPWORDS = ("the", "a")
LANG_THRESHOLD = 0.04

_MOD = 2_147_483_647  # 2^31 - 1: keeps acc*31+h < 2^63

def _hash_tok(dialect: str, tok: str) -> str:
    """28-bit deterministic token hash from md5 hex, both dialects."""
    if dialect == "spark":
        return f"CAST(conv(substring(md5({tok}), 1, 7), 16, 10) AS BIGINT)"
    return f"('0x' || substr(md5({tok}), 1, 7))::BIGINT"

def _toks(dialect: str) -> str:
    return "split(text, ' ')" if dialect == "spark" else "string_split(text, ' ')"

def _stop_pred(tok: str) -> str:
    quoted = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"{tok} IN ({quoted})"

def _stats_exprs(dialect: str) -> list[str]:
    toks = _toks(dialect)
    size = "size" if dialect == "spark" else "len"
    distinct = "array_distinct" if dialect == "spark" else "list_distinct"
    filt = "filter" if dialect == "spark" else "list_filter"
    return [
        "doc_id",
        f"CAST({size}({toks}) AS BIGINT) AS n_tokens",
        "CAST(length(text) AS BIGINT) AS n_chars_calc",
        f"CAST({size}({distinct}({toks})) AS BIGINT) AS n_distinct",
        f"CAST({size}({filt}({toks}, t -> {_stop_pred('t')})) AS BIGINT) AS n_stop",
    ]

def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token / char / distinct / stopword counts per document."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(*_stats_exprs("spark")).orderBy("doc_id")

def text_stats_sql() -> str:
    sel = ",\n       ".join(_stats_exprs("duckdb"))
    return f"SELECT {sel}\nFROM documents ORDER BY doc_id"

def _quality_expr() -> str:
    # exact-integer divisions -> deterministic doubles; identical text in
    # both dialects (all referenced columns come from the stats projection)
    return (
        "(1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.5 "
        "+ (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3 "
        "+ (CASE WHEN n_tokens >= 20 AND n_tokens <= 400 THEN 0.2 ELSE 0.0 END)"
    )

def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: stopword density, type-token ratio,
    length band — the usual pretraining heuristics, all JVM-side."""
    stats = text_stats(spark, sf_dir)
    return stats.selectExpr("doc_id", f"{_quality_expr()} AS quality").orderBy("doc_id")

def quality_scores_sql() -> str:
    return (
        f"SELECT doc_id, {_quality_expr()} AS quality\n"
        f"FROM ({text_stats_sql().replace(' ORDER BY doc_id', '')}) ORDER BY doc_id"
    )

def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language heuristic. (The corpus ``lang`` column is
    random w.r.t. the text, so this scores deterministically rather than
    predicting the label; parity with the oracle is the correctness bar.)"""
    stats = text_stats(spark, sf_dir)
    return stats.selectExpr(
        "doc_id",
        "CAST(n_stop AS DOUBLE) / n_tokens AS en_score",
        f"CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= {LANG_THRESHOLD} THEN 'en' ELSE 'unk' END AS predicted",
    ).orderBy("doc_id")

def lang_id_sql() -> str:
    inner = text_stats_sql().replace(" ORDER BY doc_id", "")
    return (
        f"SELECT doc_id,\n"
        f"       CAST(n_stop AS DOUBLE) / n_tokens AS en_score,\n"
        f"       CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= {LANG_THRESHOLD} THEN 'en' ELSE 'unk' END AS predicted\n"
        f"FROM ({inner}) ORDER BY doc_id"
    )

#: BPE-ish pre-tokenization split: letter runs, digit runs, other symbols
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

def regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-style pre-tokenizer regex (letter runs /
    digit runs / punctuation), alongside the whitespace count — the two
    standard denominators for tokens-per-doc budgeting."""
    toks = _toks("spark")
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        f"CAST(size({toks}) AS BIGINT) AS n_ws_tokens",
        f"CAST(size(regexp_extract_all(text, '{BPE_PATTERN}', 0)) AS BIGINT) AS n_bpe_tokens",
    ).orderBy("doc_id")

def regex_tokens_sql() -> str:
    toks = _toks("duckdb")
    return f"""
SELECT doc_id,
       CAST(len({toks}) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""

#: Gopher-style repetition gates (Rae et al. 2021, table A1 analogues):
#: docs whose duplicate-bigram fraction or single-most-frequent-bigram
#: share is too high are repetition spam
DUP_BIGRAM_MAX = 0.20
TOP_BIGRAM_MAX = 0.18

def _bigrams(dialect: str) -> str:
    """Word-bigram array from the space-tokenized text.

    Spark form is ``zip_with`` over two slices of a pre-computed ``toks``
    column: safe for 0/1-token documents (both slices are empty, yielding
    ``[]`` — whereas ``sequence(1, size-1)`` with size=1 produces the
    DESCENDING array [1, 0] and ``element_at`` throws
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT), and the slice arguments sit
    outside any lambda so ``toks`` is not re-evaluated per element.
    DuckDB's ``generate_series(1, 0)`` is already empty for short docs."""
    if dialect == "spark":
        return (
            "zip_with(slice(toks, 1, size(toks) - 1), "
            "slice(toks, 2, size(toks) - 1), "
            "(a, b) -> concat_ws(' ', a, b))"
        )
    toks = _toks("duckdb")
    return (
        f"list_transform(generate_series(1, len({toks}) - 1), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1])"
    )

def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-spam detection (the Gopher/C4 quality-filter family):
    per document, the fraction of duplicated word bigrams and the share
    of the single most frequent bigram; ``keep`` applies the gates.

    Scale shape: explode to (doc_id, bigram) then ONE shuffle keyed on
    (doc_id, bigram) with map-side partial counts, then a second partial
    agg back to doc_id. Keys are near-unique per doc — no skew; at 100 TB
    this is the same two-stage shape as a word count.
    """
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents")
    return spark.sql(_repetition_sql("spark"))

def _repetition_sql(dialect: str) -> str:
    bg = _bigrams(dialect)
    if dialect == "spark":
        # toks computed once in an inner projection (split would otherwise
        # run once per slice reference); explode drops 0/1-token docs, the
        # same rows DuckDB's empty unnest drops
        per_bigram = (
            f"SELECT doc_id, bigram, COUNT(*) AS c\n"
            f"FROM (SELECT doc_id, explode({bg}) AS bigram\n"
            f"      FROM (SELECT doc_id, {_toks('spark')} AS toks FROM documents))\n"
            f"GROUP BY doc_id, bigram"
        )
    else:
        per_bigram = (
            f"SELECT doc_id, bigram, COUNT(*) AS c\n"
            f"FROM (SELECT doc_id, unnest({bg}) AS bigram FROM documents) t\n"
            f"GROUP BY doc_id, bigram"
        )
    return f"""
WITH counts AS ({per_bigram}),
agg AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_bigrams,
         CAST(sum(c) - count(*) AS BIGINT) AS n_dup,
         CAST(max(c) AS BIGINT) AS top_c
  FROM counts GROUP BY doc_id)
SELECT doc_id, n_bigrams,
       CAST(n_dup AS DOUBLE) / n_bigrams AS dup_bigram_frac,
       CAST(top_c AS DOUBLE) / n_bigrams AS top_bigram_frac,
       (CAST(n_dup AS DOUBLE) / n_bigrams <= {DUP_BIGRAM_MAX}
        AND CAST(top_c AS DOUBLE) / n_bigrams <= {TOP_BIGRAM_MAX}) AS keep
FROM agg ORDER BY doc_id
"""

def repetition_filter_sql() -> str:
    return _repetition_sql("duckdb")

def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: content md5 + order-sensitive polynomial
    rolling hash over token hashes (mod 2^31-1, left fold)."""
    toks = _toks("spark")
    h = _hash_tok("spark", "t")
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "md5(text) AS content_md5",
        f"aggregate({toks}, CAST(0 AS BIGINT), (acc, t) -> (acc * 31 + {h}) % {_MOD}) AS rolling_hash",
    ).orderBy("doc_id")

def fingerprints_sql() -> str:
    toks = _toks("duckdb")
    h = _hash_tok("duckdb", "t")
    return f"""
SELECT doc_id, md5(text) AS content_md5,
       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform({toks}, t -> {h})),
                   (acc, hv) -> (acc * 31 + hv) % {_MOD}) AS rolling_hash
FROM documents ORDER BY doc_id
"""
