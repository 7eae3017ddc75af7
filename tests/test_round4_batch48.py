"""Round-4 batch-48 operators: new-vs-returning split, modality mix,
delete-aware search. Pins: Python replays of all three; the cohort law
(week 0 is all-new, total new across weeks == distinct users); the mix
identities (shares sum to 1e6, byte accounting matches 32-byte
payloads); and the deletion laws (no tombstoned id ever surfaces,
decay counter == deleted mass of the unfiltered top-k, filtered list
== brute force over the live subset).
"""

from __future__ import annotations

from collections import defaultdict

from dnstap2clickhouse_spark.functions import multimodal as fmm
from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ new vs returning


def test_new_returning_replay_and_cohort_laws(spark):
    ev = load_table(spark, SF, "events").selectExpr(
        "user_id", "unix_micros(ts) AS t_us").collect()
    t0 = min(r.t_us for r in ev)
    active = {(r.user_id, (r.t_us - t0) // 604_800_000_000) for r in ev}
    first = {}
    for u, w in sorted(active, key=lambda t: t[1]):
        first.setdefault(u, w)
    grid: dict = defaultdict(lambda: [0, 0])
    for u, w in active:
        grid[w][0] += 1
        if first[u] == w:
            grid[w][1] += 1
    out = evan.new_returning(spark, SF).collect()
    for r in out:
        n, new = grid[r.week]
        assert (r.n_active, r.n_new, r.n_returning) == (n, new, n - new)
        assert r.returning_share_e6 == (n - new) * 1_000_000 // n
    assert out[0].n_returning == 0  # week 0 is all-new by definition
    assert sum(r.n_new for r in out) == len(first)


# ------------------------------------------------ modality mix


def test_modality_mix_identities(spark):
    docs = load_table(spark, SF, "documents").select("doc_id").collect()
    per: dict = defaultdict(int)
    for r in docs:
        per[r.doc_id % 3] += 1
    mimes = {0: "image/png", 1: "audio/wav", 2: "video/mp4"}
    out = {r.mime: r for r in fmm.modality_mix(spark, SF).collect()}
    n = len(docs)
    for k, mime in mimes.items():
        r = out[mime]
        assert r.n_rows == per[k]
        assert r.total_bytes == per[k] * 32  # 32-byte stand-in payloads
        assert r.row_share_e6 == per[k] * 1_000_000 // n
    assert 999_990 <= sum(r.row_share_e6 for r in out.values()) <= 1_000_000
    assert 999_990 <= sum(r.byte_share_e6 for r in out.values()) <= 1_000_000


# ------------------------------------------------ delete-aware search


def test_delete_aware_search_laws(spark):
    out = fsim.delete_aware_search(spark, SF).collect()
    # 1) no tombstoned id ever surfaces
    for r in out:
        assert r.neighbor_id % fsim.DELETE_MOD != 3
    # 2) the filtered ranking equals brute force over the live subset
    embs = {r.vec_id: r.embedding
            for r in load_table(spark, SF, "embeddings").collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(embs[a], embs[b]))
        na = sum(x * x for x in embs[a])
        nb = sum(x * x for x in embs[b])
        return d / (na * nb) ** 0.5

    by_q: dict = defaultdict(list)
    for r in out:
        by_q[r.query_id].append((r.rank, r.neighbor_id))
    for q in range(fsim.N_QUERIES):
        live = [v for v in embs
                if v != q and v % fsim.DELETE_MOD != 3]
        expect = [v for _, v in sorted(
            ((-cos(q, v), v) for v in live))][: fsim.TOP_K]
        got = [v for _, v in sorted(by_q[q])]
        assert got == expect
    # 3) decay counter == deleted mass of the unfiltered top-k
    decay = {r.query_id: r.deleted_in_topk for r in out}
    for q in range(fsim.N_QUERIES):
        allv = [v for v in embs if v != q]
        top = [v for _, v in sorted(
            ((-cos(q, v), v) for v in allv))][: fsim.TOP_K]
        assert decay[q] == sum(1 for v in top if v % fsim.DELETE_MOD == 3)
