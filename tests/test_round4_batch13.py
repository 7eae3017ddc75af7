"""Round-4 batch-13 operators: mergeable top-k partials, sign-packed
Hamming search, k-fold assignment. These pin the operators' meaning:
the combine path agreeing across partitionings, a full Python replay of
the bit packing + Hamming ranking, and the fold assignment's partition /
balance / decoupling properties.
"""

from __future__ import annotations

from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.functions.splits import LEHMER_A, LEHMER_P
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# --------------------------------------------------- top-k merge


def test_topk_merge_exact_and_complete(spark):
    out = evan.approx_topk_merge(spark, SF).collect()
    per_type = {}
    for r in out:
        assert r.est_ok, f"{r.event_type}/{r.user_id}: merged estimate != exact"
        per_type.setdefault(r.event_type, []).append(r.rank)
    for ranks in per_type.values():
        assert sorted(ranks) == list(range(1, evan.TOPK_MERGE_N + 1))


def test_topk_merge_partition_independence(spark):
    """Hourly partials combine to the same estimates as daily partials
    (the property that makes persisted sketch states safe to roll up
    at any grain)."""
    load_table(spark, SF, "events").createOrReplaceTempView("events")
    ests = {}
    for grain in ("day", "hour"):
        rows = spark.sql(
            f"""
            SELECT event_type, e.item AS user_id, e.count AS n
            FROM (SELECT event_type,
                         explode(approx_top_k_estimate(
                             approx_top_k_combine(st), {evan.TOPK_MERGE_CAP})) AS e
                  FROM (SELECT event_type, date_trunc('{grain}', ts) AS g,
                               approx_top_k_accumulate(user_id) AS st
                        FROM events GROUP BY event_type, date_trunc('{grain}', ts))
                  GROUP BY event_type)
            """
        ).collect()
        ests[grain] = {(r.event_type, r.user_id): r.n for r in rows}
    assert ests["day"] == ests["hour"]


# ------------------------------------------------ binary Hamming


def test_binary_hamming_python_replay(spark):
    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()

    def pack(v):
        w = [0, 0]
        for i, x in enumerate(v):
            if x >= 0:
                w[i // 32] |= 1 << (i % 32)
        return w

    packed = {r.vec_id: pack([float(x) for x in r.embedding]) for r in rows}
    expect = {}
    for q in sorted(packed):
        if q >= fsim.N_QUERIES:
            break
        scored = sorted(
            (
                bin(packed[q][0] ^ packed[c][0]).count("1")
                + bin(packed[q][1] ^ packed[c][1]).count("1"),
                c,
            )
            for c in packed
            if c != q
        )[: fsim.BIN_TOP_K]
        for rank, (h, c) in enumerate(scored, 1):
            expect[(q, rank)] = (c, h)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.hamming)
        for r in fsim.binary_hamming_topk(spark, SF).collect()
    }
    assert got == expect


def test_binary_hamming_all_integer_schema(spark):
    """The strongest-oracle claim: every output column is integral."""
    df = fsim.binary_hamming_topk(spark, SF)
    assert all(t == "bigint" for _, t in df.dtypes)


# ----------------------------------------------------- k-fold


def test_kfold_partition_balance_and_replay(spark):
    out = fsplit.kfold_assign(spark, SF).collect()
    docs = load_table(spark, SF, "documents").select("doc_id").collect()
    assert len(out) == len({r.doc_id for r in out}) == len(docs)
    sizes = {}
    for r in out:
        assert 0 <= r.fold < fsplit.K_FOLDS
        sizes[r.fold] = sizes.get(r.fold, 0) + 1
        h1 = (r.doc_id % LEHMER_P) * LEHMER_A % LEHMER_P
        assert r.fold == h1 * LEHMER_A % LEHMER_P % fsplit.K_FOLDS
    mean = len(out) / fsplit.K_FOLDS
    assert all(0.5 * mean <= s <= 1.5 * mean for s in sizes.values())


def test_kfold_decoupled_from_split(spark):
    """fold must NOT be a function of the split bucket: within at least
    one split, multiple folds occur (the first-round hash would fail
    this decoupling in spirit: bucket%100 determines bucket%5)."""
    from dnstap2clickhouse_spark.functions.splits import assign_split

    df = assign_split(load_table(spark, SF, "documents"))
    joined = df.join(fsplit.kfold_assign(spark, SF), "doc_id")
    per_bucket = (
        joined.groupBy("bucket").agg({"fold": "approx_count_distinct"}).collect()
    )
    assert any(r[1] > 1 for r in per_bucket), "fold is constant per bucket"
