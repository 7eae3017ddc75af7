"""Round-4 batch-14 operators: WebDataset shard packing, GDPR batch
erasure, k-core peeling. These pin the operators' meaning: a full
Python replay of the prefix-sum shard layout plus partitioning
independence of the distributed cumsum, the erasure cohort's exact
membership + zero-residue proof recomputed in Python, and the k-core
peel replayed to fixpoint on the real corpus plus an engineered
cascade fixture that exercises the full unroll depth — including the
honesty case where the certificate must report non-convergence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dnstap2clickhouse_spark.functions import multimodal as fmm
from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.functions.splits import LEHMER_A, LEHMER_P
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.plans import graph as pgraph
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- shard manifest


def test_shard_manifest_python_replay(spark):
    """The whole layout — byte costs, running offsets, shard ids —
    recomputed sequentially in Python from the raw documents."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    cum, expect = 0, {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        # payload = unhex(repeat(md5(text), 2)) -> 32 bytes, caption = utf-8 text
        nb = 32 + len(r.text.encode("utf-8"))
        expect[r.doc_id] = (nb, cum, cum // fmm.SHARD_BYTES)
        cum += nb

    out = fmm.shard_manifest(spark, SF).collect()
    assert len(out) == len(expect)
    for r in out:
        assert (r.item_bytes, r.start_byte, r.shard_id) == expect[r.doc_id], r.doc_id


def test_shard_manifest_packing_invariants(spark):
    """Start-offset sharding: items never split across shards, offsets
    are contiguous in doc_id order, shard ids are non-decreasing, and
    each shard's payload is bounded by budget + one max item."""
    rows = sorted(fmm.shard_manifest(spark, SF).collect(), key=lambda r: r.doc_id)
    prev_end, prev_shard = 0, 0
    shard_bytes: dict[int, int] = {}
    for r in rows:
        assert r.start_byte == prev_end  # contiguous concatenation
        assert r.shard_id == r.start_byte // fmm.SHARD_BYTES
        assert r.shard_id >= prev_shard  # monotone layout
        shard_bytes[r.shard_id] = shard_bytes.get(r.shard_id, 0) + r.item_bytes
        prev_end, prev_shard = r.start_byte + r.item_bytes, r.shard_id
    max_item = max(r.item_bytes for r in rows)
    for sid, nb in shard_bytes.items():
        assert nb <= fmm.SHARD_BYTES + max_item, (sid, nb)


def test_global_prefix_sum_partitioning_independent(spark):
    """The distributed cumsum depends only on the order column, never
    on where range boundaries land: an adversarially reshuffled input
    (13 hash partitions) produces the identical global prefix sum."""
    docs = load_table(spark, SF, "documents").selectExpr(
        "doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS w"
    )
    base = {
        r.doc_id: r.g
        for r in fsplit.global_prefix_sum(spark, docs, "doc_id", "w")
        .selectExpr("doc_id", "__base + __local_end AS g")
        .collect()
    }
    shuffled = {
        r.doc_id: r.g
        for r in fsplit.global_prefix_sum(spark, docs.repartition(13), "doc_id", "w")
        .selectExpr("doc_id", "__base + __local_end AS g")
        .collect()
    }
    assert base == shuffled


# --------------------------------------------------- user erasure


def _erased(uid: int) -> bool:
    h1 = (uid % LEHMER_P) * LEHMER_A % LEHMER_P
    return (h1 * LEHMER_A % LEHMER_P) % evan.ERASURE_BUCKETS == 0


def test_user_erasure_python_replay(spark):
    """Cohort membership, per-type before/after/erased counts, distinct
    erased users, and the zero-residue proof — all recomputed from the
    raw events in Python."""
    ev = load_table(spark, SF, "events").select("event_type", "user_id").collect()
    before: dict[str, int] = {}
    after: dict[str, int] = {}
    users: dict[str, set] = {}
    for r in ev:
        before[r.event_type] = before.get(r.event_type, 0) + 1
        if _erased(r.user_id):
            users.setdefault(r.event_type, set()).add(r.user_id)
        else:
            after[r.event_type] = after.get(r.event_type, 0) + 1

    out = evan.user_erasure(spark, SF).collect()
    assert {r.event_type for r in out} == set(before)
    for r in out:
        assert r.residue == 0
        assert r.n_before == before[r.event_type]
        assert r.n_after == after.get(r.event_type, 0)
        assert r.n_erased == r.n_before - r.n_after
        assert r.n_erased_users == len(users.get(r.event_type, set()))
    # the cohort must be non-trivial for the entry to certify anything
    assert sum(r.n_erased for r in out) > 0
    assert sum(r.n_after for r in out) > 0


def test_user_erasure_is_broadcastable_anti_join_shape(spark):
    """The kept relation equals events minus the cohort exactly (the
    anti-join semantics), certified per event row, not just per count."""
    ev = load_table(spark, SF, "events")
    kept = ev.where(
        ~(F.expr(fsplit._bucket2_sql("user_id", evan.ERASURE_BUCKETS)) == 0)
    )
    assert kept.where(
        F.expr(fsplit._bucket2_sql("user_id", evan.ERASURE_BUCKETS)) == 0
    ).count() == 0
    assert kept.count() + ev.where(
        F.expr(fsplit._bucket2_sql("user_id", evan.ERASURE_BUCKETS)) == 0
    ).count() == ev.count()


# -------------------------------------------------------- k-core


def _peel(edges: set[tuple[int, int]], k: int):
    """Reference peeling to fixpoint: returns (members with in-core
    degree, rounds-to-fixpoint). ``edges`` is undirected (a < b)."""
    alive = {v for e in edges for v in e}
    rounds = 0
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        keep = {v for v in alive if deg.get(v, 0) >= k}
        rounds += 1
        if keep == alive:
            return {v: deg[v] for v in alive}, rounds
        alive = keep


def test_kcore_python_replay(spark):
    """Peel the real sf0.001 co-purchase graph to fixpoint in Python;
    the entry's member set, in-core degrees, and converged=True must
    all agree."""
    from dnstap2clickhouse_spark.sources.tables import register_views

    register_views(spark, SF, ("lineitem",))
    edges = {
        (r.a, r.b)
        for r in spark.sql(f"SELECT * FROM ({pgraph._copurchase_cte()})").collect()
    }
    core, rounds = _peel(edges, pgraph.KCORE_K)
    assert rounds <= pgraph.KCORE_ROUNDS  # the unroll really covers this corpus

    out = pgraph.kcore(spark, SF).collect()
    assert {r.part: r.core_degree for r in out} == core
    assert all(r.converged for r in out)
    assert all(r.core_degree >= pgraph.KCORE_K for r in out)


def _edges_to_lineitem(spark, edges):
    """Encode an undirected edge list as a minimal lineitem fixture:
    one order per edge, both endpoints shipped at the qualifying
    quantity, so the co-purchase CTE reproduces exactly ``edges``."""
    rows = []
    for i, (a, b) in enumerate(sorted(edges)):
        rows.append((i, a, float(pgraph.TRIANGLE_MIN_QTY)))
        rows.append((i, b, float(pgraph.TRIANGLE_MIN_QTY)))
    return spark.createDataFrame(
        rows, "l_orderkey BIGINT, l_partkey BIGINT, l_quantity DOUBLE"
    )


CLIQUE = {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}


def test_kcore_cascade_fixture(spark):
    """A cascade engineered to need the FULL unroll: leaves peel in
    round 0, then v6, then v5 — the 4-round unroll lands exactly on the
    fixpoint and must certify converged=true with only the clique
    surviving."""
    edges = CLIQUE | {(1, 5), (2, 5), (5, 6), (6, 7), (6, 8)}
    core, rounds = _peel(edges, pgraph.KCORE_K)
    assert set(core) == {1, 2, 3, 4} and rounds == 4

    orig = load_table(spark, SF, "lineitem")
    try:
        _edges_to_lineitem(spark, edges).createOrReplaceTempView("lineitem")
        out = spark.sql(pgraph._kcore_sql("spark")).collect()
        assert {r.part for r in out} == {1, 2, 3, 4}
        assert all(r.core_degree == 3 for r in out)
        assert all(r.converged for r in out)
    finally:
        orig.createOrReplaceTempView("lineitem")


def test_kcore_certificate_honest_on_deep_cascade(spark):
    """A cascade deeper than the unroll covers (the initial degree
    filter plus 4 peel rounds): the fixed rounds have NOT reached the
    fixpoint, and the certificate must say so (converged=false) rather
    than silently presenting the last survivor set — whose degrees are
    still inflated by the not-yet-peeled tail — as the core. The
    oracle computes the same flag, so the hash stays green even on a
    corpus needing more rounds — this pins that honesty."""
    # Simultaneous peeling kills a plain chain in two rounds (every
    # leaf-propped link drops at once), so depth needs BRANCHING: a
    # binary tree hung off clique vertex 1 where each level-i node has
    # two level-(i-1) children + its parent (degree exactly 3) and dies
    # only after its children do. Depth 4 ⇒ the root dies in the very
    # last unrolled round, so the k4-vs-k3 fixpoint check fails.
    edges = set(CLIQUE)
    nid = [100]

    def build(level: int, parent: int) -> None:
        v = nid[0]
        nid[0] += 1
        edges.add((min(parent, v), max(parent, v)))
        if level > 0:
            build(level - 1, v)
            build(level - 1, v)

    build(4, 1)
    core, rounds = _peel(edges, pgraph.KCORE_K)
    assert set(core) == {1, 2, 3, 4} and rounds == 6  # > unroll's 5 evals

    orig = load_table(spark, SF, "lineitem")
    try:
        _edges_to_lineitem(spark, edges).createOrReplaceTempView("lineitem")
        out = spark.sql(pgraph._kcore_sql("spark")).collect()
        assert all(not r.converged for r in out)
        # the survivor set happens to equal the true core here, but
        # vertex 1's degree still counts the unpeeled tree root — the
        # flag is what warns that these numbers aren't final
        assert {r.part for r in out} == {1, 2, 3, 4}
        assert {r.part: r.core_degree for r in out} == {1: 4, 2: 3, 3: 3, 4: 3}
    finally:
        orig.createOrReplaceTempView("lineitem")
