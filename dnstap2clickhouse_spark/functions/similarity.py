"""Similarity search over the ``embeddings`` table (``array<float>``).

Two paths, as a production pipeline would have:

- **Brute-force cosine top-k** — the exact baseline. Dot products run as
  a sequential left fold (``aggregate(zip_with(...))``) entirely
  JVM-side; DuckDB's ``list_dot_product`` folds the same way, so the
  doubles are bit-identical (verified) and the oracle compares exactly.
- **LSH-bucketed ANN** — the scale path: a deterministic sign-bit bucket
  over leading dimensions turns the all-pairs crossJoin into an equi-join
  on the bucket id. At 100 TB the bucket column is also the natural
  partition/bucketing key for the vector table.

Scale notes: the brute-force path broadcasts the (small) query set so the
candidate side never shuffles; top-k per query is a window row_number
bounded by k (partial top-k per partition under AQE). Everything is
column-functional — no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 5
LSH_TABLES = 4  # hash tables, each over its own dim slice
LSH_BITS = 4  # sign bits per table -> 16 buckets/table

def _dot(a: str, b: str, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"

def _cosine(a: str, b: str, dialect: str) -> str:
    return (
        f"{_dot(a, b, dialect)} / "
        f"sqrt({_dot(a, a, dialect)} * {_dot(b, b, dialect)})"
    )

def _register(spark: SparkSession, sf_dir: str) -> None:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")

def _brute_force_sql(dialect: str) -> str:
    cos = _cosine("q.embedding", "c.embedding", dialect)
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {cos} AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERIES}),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""

def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for the query vectors."""
    _register(spark, sf_dir)
    return spark.sql(_brute_force_sql("spark"))

def cosine_topk_sql() -> str:
    return _brute_force_sql("duckdb")

def _bucket_expr(col: str, table: int, dialect: str) -> str:
    """Sign-bit bucket for hash table `table` over its own dim slice:
    sum(2^i * [v_{table*LSH_BITS + i} >= 0])."""
    terms = []
    for i in range(LSH_BITS):
        dim = table * LSH_BITS + i + 1  # 1-indexed in both dialects
        elem = f"element_at({col}, {dim})" if dialect == "spark" else f"{col}[{dim}]"
        terms.append(f"CASE WHEN {elem} >= 0 THEN {1 << i} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"

def _lsh_sql(dialect: str) -> str:
    """Multi-table sign-LSH: UNION (distinct) of per-table same-bucket
    equi-joins — each branch stays a hash/broadcast equi-join at scale;
    more tables = higher recall at linear candidate cost."""
    cos = _cosine("q.embedding", "c.embedding", dialect)
    branches = []
    for t in range(LSH_TABLES):
        bq = _bucket_expr("q.embedding", t, dialect)
        bc = _bucket_expr("c.embedding", t, dialect)
        branches.append(
            f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {cos} AS cosine\n"
            f"  FROM embeddings q JOIN embeddings c\n"
            f"    ON q.vec_id <> c.vec_id AND {bq} = {bc}\n"
            f"  WHERE q.vec_id < {N_QUERIES}"
        )
    union = "\nUNION\n".join(branches)
    return f"""
WITH scored AS (
{union}),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""

def lsh_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table sign-bit LSH: only same-bucket candidates
    scored; union across tables trades compute for recall."""
    _register(spark, sf_dir)
    return spark.sql(_lsh_sql("spark"))

def lsh_bucketed_ann_sql() -> str:
    return _lsh_sql("duckdb")

def _centroid_sql(dialect: str) -> str:
    """Per-label centroids via scaled-integer sums (order-free, exact)."""
    if dialect == "spark":
        elem = "element_at(embedding, CAST(dim AS INT))"
        series = "explode(sequence(1, size(embedding)))"
    else:
        elem = "embedding[dim]"
        series = "unnest(generate_series(1, len(embedding)))"
    scaled = f"CAST(round(CAST({elem} AS DOUBLE) * 1000000000) AS BIGINT)"
    return f"""
WITH dims AS (SELECT label, embedding, {series} AS dim FROM embeddings),
sums AS (
  SELECT label, CAST(dim AS BIGINT) AS dim,
         CAST(sum({scaled}) AS BIGINT) AS s, count(*) AS n
  FROM dims GROUP BY label, dim)
SELECT CAST(label AS BIGINT) AS label, dim,
       CAST(s AS DOUBLE) / (CAST(1000000000 AS DOUBLE) * n) AS centroid
FROM sums ORDER BY label, dim
"""

def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean embedding per label (the IVF coarse-quantizer
    building block), deterministic via scaled-integer sums."""
    _register(spark, sf_dir)
    return spark.sql(_centroid_sql("spark"))

def label_centroids_sql() -> str:
    return _centroid_sql("duckdb")
