"""Pair-sampled ground-truth verifiers (r8 verdict item 2).

The contract carried three deliberately-quadratic ground-truth entries —
``dedup_ngram_jaccard`` (exact 3-gram Jaccard over a shingle self-join),
``dedup_embedding_cosine`` (all-pairs cosine), and
``dedup_embedding_lsh_recall`` (recall of the LSH dedup against that
all-pairs relation) — each a declared waiver in ``tools/audit_plans.py``
and the slowest rows of the ~sf1 replica sweep (730 s / 486 s). This
module retires the waivers with the deterministic hash-mod pair sample
the r8 replica gate introduced (``tools/check_correctness.py``), applied
INSIDE the entries' ground-truth relations on BOTH dialects:

    keep pair (a, b)  iff  (a * 2654435761 + b) % GT_SAMPLE_MOD == 0

Two properties make this the right fix rather than a smaller lie:

1. **The predicate decomposes into an equi-join key.** For non-negative
   ids, ``(a*K + b) % M == 0`` is exactly
   ``(M - (a*(K % M)) % M) % M == b % M`` — a residue each side computes
   from its OWN id. The all-pairs relation becomes a plain hash/merge
   equi-join on that residue (with ``a < b`` as a residual condition),
   so the physical plan the audit inspects has no CartesianProduct /
   BroadcastNestedLoopJoin at all: the waiver is retired structurally,
   not excused. The residue also spreads a hot join key over
   ``GT_SAMPLE_MOD`` reducer tasks (the shingle self-join's per-task
   blowup drops from f^2 to (f/M)^2 per hot shingle of frequency f).
2. **Sampling commutes with the verified statistic.** The predicate is a
   deterministic function of the PAIR KEY alone, applied before any
   scoring: the sampled output equals the full relation filtered by the
   predicate row-for-row (pinned at sf0.01 by
   ``tests/test_round9_fixes.py``), and the recall entry's numerator and
   denominator are both restricted to the same sampled pair population,
   so the quotient is the true recall ON that deterministic sample.
   Per-pair scores (jaccard counts, cosine folds) are computed exactly —
   nothing inside a kept pair is sampled.

The sampled SQL is composed by assertion-guarded substring substitution
of the PRODUCTION dialect builders (``dedup._jaccard_sql``,
``similarity._cosine_pairs_sql``, ``similarity._embedding_lsh_recall_sql``)
— the ``sampled_minhash_recall_sql`` technique from the r8 gate — so SQL
drift in the production modules fails loudly here instead of silently
diverging. The full exact forms remain exported by their home modules
(``ngram_jaccard_pairs``, ``embedding_cosine_dups``,
``embedding_lsh_dup_recall``) as the small-scale verifiers the test
suite pins; the measured scale paths (``dedup_minhash_lsh``,
``dedup_embedding_lsh``) are untouched.

``GT_SAMPLE_MOD`` is 7 (not the gate's 97): the contract adjudicates at
sf0.01 where the full relations hold only 25 / 14 pairs — mod 97 would
hand the driver a 0-row compare. Mod 7 keeps 2-4 value-bearing rows at
sf0.01 while cutting the ~sf1 replica's quadratic work 7x (the 730 s
all-pairs fold drops to ~100 s) and the per-task skew 49x.

Reference scope: beyond dnstap2clickhouse's surface (the reference has
no dedup pipeline); these are the verification harness for the
LLM-pipeline dedup family, see SCALING.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dnstap2clickhouse_spark.functions import dedup as _dd
from dnstap2clickhouse_spark.functions import similarity as _fsim

#: Knuth multiplicative mixer — same constant as the r8 replica gate's
#: SAMPLE_PRED (tools/check_correctness.py) so the two sampling layers
#: stay one protocol.
GT_KNUTH = 2654435761

#: pair-sample modulus for the in-contract ground-truth entries (see
#: module docstring for why 7, not the gate's 97).
GT_SAMPLE_MOD = 7

#: GT_KNUTH reduced mod GT_SAMPLE_MOD — the residue form multiplies ids
#: by THIS, so the product stays < 2^27 even for replica-scale ids and
#: both engines agree without overflow thought.
GT_KM = GT_KNUTH % GT_SAMPLE_MOD


def gt_sample_pred(a: str, b: str) -> str:
    """The canonical pair predicate, for output-side filtering and for
    tests asserting the residue join equals it."""
    return f"({a} * {GT_KNUTH} + {b}) % {GT_SAMPLE_MOD} = 0"


def _residue_join(cte: str, id_col: str, cols: str, extra_on: str = "") -> str:
    """``FROM <cte> a JOIN <cte> b`` rewritten as the residue-keyed
    equi-join implementing ``gt_sample_pred(a.id, b.id)``:

    a-side key  (M - (id*KM) % M) % M   ==   b-side key  id % M
    """
    m, km = GT_SAMPLE_MOD, GT_KM
    return (
        f"FROM (SELECT {cols}, ({m} - ({id_col} * {km}) % {m}) % {m} AS __ka FROM {cte}) a\n"
        f"  JOIN (SELECT {cols}, {id_col} % {m} AS __kb FROM {cte}) b\n"
        f"    ON {extra_on}a.__ka = b.__kb AND a.{id_col} < b.{id_col}"
    )


def _substitute(full: str, old: str, new: str, what: str) -> str:
    """Assertion-guarded one-shot substitution: production-SQL drift
    fails loudly here instead of silently diverging (the
    ``sampled_minhash_recall_sql`` rule)."""
    assert old in full, f"{what}: production SQL drifted; update ground_truth.py"
    return full.replace(old, new, 1)


# ------------------------------------------------- exact n-gram Jaccard

def _sampled_jaccard_sql(dialect: str) -> str:
    """``dedup._jaccard_sql`` with the pair sample keyed into the shingle
    self-join. Join keys become (shingle, residue): the hot-shingle
    straggler the old DECLARED waiver named is spread over GT_SAMPLE_MOD
    tasks at (f/M)^2 rows each, and the pair-aggregate state shrinks M x.
    ``common`` per kept pair is still counted over ALL the pair's
    shingles — the jaccard values are exact."""
    full = _dd._jaccard_sql(dialect)
    old = "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id"
    new = _residue_join("s", "doc_id", "doc_id, sh", extra_on="a.sh = b.sh AND ")
    return _substitute(full, old, new, "ngram_jaccard pair join")


def sampled_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs on the deterministic 1/7 pair
    sample (contract form of the ground-truth verifier; the full exact
    relation stays available as ``dedup.ngram_jaccard_pairs``)."""
    _dd._register(spark, sf_dir)
    return spark.sql(_sampled_jaccard_sql("spark"))


def sampled_ngram_jaccard_pairs_sql() -> str:
    return _sampled_jaccard_sql("duckdb")


# ------------------------------------------------- all-pairs cosine dups

def _sampled_cosine_pairs_sql(dialect: str) -> str:
    """``similarity._cosine_pairs_sql`` with the all-pairs nested loop
    replaced by the residue equi-join: the O(n^2) cosine fold runs only
    on the kept 1/7 of pairs, and the plan is a hash/merge join."""
    full = _fsim._cosine_pairs_sql(dialect)
    old = "FROM e a JOIN e b ON a.vec_id < b.vec_id"
    new = _residue_join("e", "vec_id", "vec_id, embedding, nrm")
    return _substitute(full, old, new, "cosine all-pairs join")


def sampled_embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs on the deterministic 1/7
    pair sample (contract form of the all-pairs verifier; full form:
    ``similarity.embedding_cosine_dups``)."""
    _fsim._register(spark, sf_dir, spread=True)
    return spark.sql(_sampled_cosine_pairs_sql("spark"))


def sampled_embedding_cosine_dups_sql() -> str:
    return _sampled_cosine_pairs_sql("duckdb")


# --------------------------------------------- LSH dedup recall vs exact

def _sampled_lsh_recall_sql(dialect: str) -> str:
    """``similarity._embedding_lsh_recall_sql`` with BOTH pair CTEs
    restricted to the same deterministic pair sample: ``exact_pairs`` by
    the residue equi-join (it embeds the quadratic verifier), and
    ``lsh_pairs`` by the equivalent output predicate (its candidate join
    is already equi/bucketed — a post-filter costs nothing). Numerator
    and denominator are restricted identically, so the quotient is the
    true pair recall on the sampled population."""
    full = _fsim._embedding_lsh_recall_sql(dialect)
    exact = _fsim._cosine_pairs_sql(dialect).replace("ORDER BY vec_a, vec_b", "")
    sampled_exact = _sampled_cosine_pairs_sql(dialect).replace(
        "ORDER BY vec_a, vec_b", ""
    )
    lsh = _fsim._embedding_lsh_pairs_sql(dialect).replace("ORDER BY vec_a, vec_b", "")
    sampled_lsh = (
        f"SELECT * FROM ({lsh}\n) __lshsamp WHERE {gt_sample_pred('vec_a', 'vec_b')}"
    )
    full = _substitute(full, exact, sampled_exact, "recall exact_pairs CTE")
    return _substitute(full, lsh, sampled_lsh, "recall lsh_pairs CTE")


def sampled_embedding_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row pair-recall of the LSH embedding dedup vs the exact
    relation, both restricted to the deterministic 1/7 pair sample
    (contract form; full form: ``similarity.embedding_lsh_dup_recall``)."""
    _fsim._register(spark, sf_dir, spread=True)
    return spark.sql(_sampled_lsh_recall_sql("spark"))


def sampled_embedding_lsh_recall_sql() -> str:
    return _sampled_lsh_recall_sql("duckdb")
