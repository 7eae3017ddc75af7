"""Round-4 batch-35 operators: RFM segmentation, winnowing
fingerprints, cell-pruned kNN graph. Pins: full Python replays (ntile
quintiles, the rightmost-min window rule, same-order cosine folds),
the winnowing coverage theorem on the real corpus, and the kNN graph's
structural invariants (cell-locality, k-bound, rank contiguity,
consistency with the audited k-means assignment).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.functions import text as ftext
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _e2(v: float) -> int:
    return int((Decimal(v) * 100).quantize(Decimal(1), ROUND_HALF_UP))


# ------------------------------------------------ RFM


def _ntile(keys, n):
    """Standard NTILE: first (len % n) groups get the extra row."""
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    size, extra = divmod(len(keys), n)
    out = [0] * len(keys)
    pos = 0
    for g in range(1, n + 1):
        cnt = size + (1 if g <= extra else 0)
        for _ in range(cnt):
            out[order[pos]] = g
            pos += 1
    return out


def test_rfm_python_replay(spark):
    ev = load_table(spark, SF, "events").selectExpr(
        "user_id", "unix_micros(ts) AS us", "value"
    ).collect()
    agg: dict = {}
    for r in ev:
        last, n, m = agg.get(r.user_id, (0, 0, 0))
        agg[r.user_id] = (max(last, r.us), n + 1, m + _e2(r.value))
    users = sorted(agg)
    now = max(v[0] for v in agg.values())
    T = evan.RFM_TILES
    r_t = _ntile([(now - agg[u][0], u) for u in users], T)
    f_t = _ntile([(agg[u][1], u) for u in users], T)
    m_t = _ntile([(agg[u][2], u) for u in users], T)
    expect = {
        u: (now - agg[u][0], agg[u][1], agg[u][2],
            T + 1 - r_t[i], f_t[i], m_t[i])
        for i, u in enumerate(users)
    }

    out = evan.rfm_segments(spark, SF).collect()
    assert len(out) == len(users)
    for r in out:
        rec, n, m, rs, fs, ms = expect[r.user_id]
        assert (r.recency_us, r.n_events, r.monetary_e2) == (rec, n, m)
        assert (r.r_score, r.f_score, r.m_score) == (rs, fs, ms)
        assert r.rfm == rs * 100 + fs * 10 + ms


# ------------------------------------------------ winnowing


def _winnow_replay(text: str):
    toks = text.split(" ")
    k, w = ftext.WINNOW_K, ftext.WINNOW_W
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:7], 16) for g in grams]
    sel = set()
    for p in range(len(hs) - w + 1):
        win = hs[p : p + w]
        mn = min(win)
        # rightmost minimal hash in the window
        off = max(i for i, h in enumerate(win) if h == mn)
        sel.add((p + off + 1, mn))  # 1-based gram position
    return sel


def test_winnow_python_replay(spark):
    docs = load_table(spark, SF, "documents").collect()
    expect = []
    for d in docs:
        for pos, h in _winnow_replay(d.text):
            expect.append((d.doc_id, pos, h))
    expect.sort()

    out = [(r.doc_id, r.fp_pos, r.fp_hash)
           for r in ftext.winnow_fingerprints(spark, SF).collect()]
    assert sorted(out) == expect


def test_winnow_coverage_guarantee(spark):
    """The paper's theorem: every window of W consecutive gram
    positions contains at least one selected fingerprint."""
    by_doc: dict = defaultdict(set)
    for r in ftext.winnow_fingerprints(spark, SF).collect():
        by_doc[r.doc_id].add(r.fp_pos)
    texts = {d.doc_id: d.text
             for d in load_table(spark, SF, "documents").collect()}
    w, k = ftext.WINNOW_W, ftext.WINNOW_K
    for doc_id, positions in by_doc.items():
        n_grams = len(texts[doc_id].split(" ")) - k + 1
        for start in range(1, n_grams - w + 2):
            assert any(start <= p < start + w for p in positions), (
                doc_id, start)


# ------------------------------------------------ kNN graph


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def test_knn_graph_structure_and_cells(spark):
    out = fsim.knn_graph(spark, SF).collect()
    cells = {r.vec_id: r.cluster
             for r in fsim.kmeans_assign(spark, SF).collect()}
    by_src: dict = defaultdict(list)
    for r in out:
        assert cells[r.src] == r.cluster == cells[r.dst]  # cell locality
        by_src[r.src].append(r)
    occupancy: dict = defaultdict(int)
    for c in cells.values():
        occupancy[c] += 1
    for src, rows in by_src.items():
        ranks = sorted(r.rank for r in rows)
        expected_n = min(fsim.KNN_K, occupancy[cells[src]] - 1)
        assert ranks == list(range(1, expected_n + 1))  # contiguous top-k
    # every vector with a non-singleton cell appears as a source
    assert set(by_src) == {v for v, c in cells.items() if occupancy[c] > 1}


def test_knn_graph_python_replay(spark):
    emb = {r.vec_id: list(r.embedding)
           for r in load_table(spark, SF, "embeddings").collect()}
    cells = {r.vec_id: r.cluster
             for r in fsim.kmeans_assign(spark, SF).collect()}
    members: dict = defaultdict(list)
    for v, c in cells.items():
        members[c].append(v)
    nrm = {v: _fold_dot(e, e) for v, e in emb.items()}
    expect = []
    for c, vs in members.items():
        for x in vs:
            scored = sorted(
                ((-(_fold_dot(emb[x], emb[y]) / (nrm[x] * nrm[y]) ** 0.5), y)
                 for y in vs if y != x)
            )[: fsim.KNN_K]
            for rk, (negcos, y) in enumerate(scored, 1):
                expect.append((x, rk, y, -negcos))
    expect.sort()

    out = sorted((r.src, r.rank, r.dst, r.cosine)
                 for r in fsim.knn_graph(spark, SF).collect())
    assert [(a, b, c) for a, b, c, _ in out] == [
        (a, b, c) for a, b, c, _ in expect]
    for (_, _, _, g), (_, _, _, e) in zip(out, expect):
        assert abs(g - e) < 1e-9
