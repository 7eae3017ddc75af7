"""Round-4 batch-39 operators: video scene-cut detection, classifier
eval harness, zone-map pruning audit. Pins: Python replays of the
frame-delta cuts, the confusion-matrix marginals, and the rectangle
intersect test; pruning COMPLETENESS (every row matching the predicate
lives in a scanned bucket) and EFFECTIVENESS (some buckets are
skipped); and the eval identities (precision/recall denominators are
the true marginals, cells sum to the corpus).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from dnstap2clickhouse_spark.functions import multimodal as fmm
from dnstap2clickhouse_spark.functions import text as ftext
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ scene cuts


def test_scene_cuts_python_replay(spark):
    texts = {r.doc_id: r.text
             for r in load_table(spark, SF, "documents").collect()
             if r.doc_id % 3 == 2}
    expect = []
    for d in sorted(texts):
        h = hashlib.md5(texts[d].encode()).hexdigest() * 2
        n = 1 + d % 30
        vals = [int(h[2 * f: 2 * f + 2], 16) for f in range(n)]
        for f in range(1, n):
            delta = abs(vals[f] - vals[f - 1])
            if delta >= fmm.SCENE_THRESH:
                expect.append((d, f, vals[f - 1], vals[f], delta))
    got = [(r.doc_id, r.frame_idx, r.prev_v, r.v, r.delta)
           for r in fmm.scene_cuts(spark, SF).collect()]
    assert got == expect
    assert len(got) > 0


# ------------------------------------------------ eval harness


def test_langid_eval_identities(spark):
    docs = load_table(spark, SF, "documents").collect()
    n_docs = len(docs)
    out = ftext.langid_eval(spark, SF).collect()
    assert sum(r.n for r in out) == n_docs
    pred_tot: dict = defaultdict(int)
    true_tot: dict = defaultdict(int)
    for r in out:
        pred_tot[r.pred_lang] += r.n
        true_tot[r.true_lang] += r.n
    for r in out:
        assert r.precision_e6 == r.n * 1_000_000 // pred_tot[r.pred_lang]
        assert r.recall_e6 == r.n * 1_000_000 // true_tot[r.true_lang]


def test_langid_eval_python_replay(spark):
    docs = load_table(spark, SF, "documents").collect()
    cells: dict = defaultdict(int)
    for r in docs:
        toks = r.text.split(" ")
        stop = sum(t in ftext.STOPWORDS for t in toks)
        pred = "en" if stop / len(toks) >= ftext.LANG_THRESHOLD else "unk"
        cells[(r.lang, pred)] += 1
    got = {(r.true_lang, r.pred_lang): r.n
           for r in ftext.langid_eval(spark, SF).collect()}
    assert got == dict(cells)


# ------------------------------------------------ zone-map pruning


def test_zonemap_prune_complete_and_effective(spark):
    out = evan.zonemap_prune(spark, SF).collect()
    scanned = {r.z_bucket for r in out if r.scanned}
    # effective: the mid-quartile box must not force a full scan
    assert 0 < len(scanned) < len(out)
    # derive the predicate box exactly as the query does
    u_lo = min(r.user_lo for r in out); u_hi = max(r.user_hi for r in out)
    h_lo = min(r.hour_lo for r in out); h_hi = max(r.hour_hi for r in out)
    u_a, u_b = u_lo + (u_hi - u_lo) // 4, u_lo + (u_hi - u_lo) // 2
    h_a, h_b = h_lo + (h_hi - h_lo) // 4, h_lo + (h_hi - h_lo) // 2
    # per-bucket flag replay: rectangle-vs-box intersection
    for r in out:
        expect = (r.user_hi >= u_a and r.user_lo <= u_b
                  and r.hour_hi >= h_a and r.hour_lo <= h_b)
        assert r.scanned == expect
    # completeness: recompute every event's bucket; any event inside
    # the box must land in a scanned bucket (zone maps never lose rows)
    ev = load_table(spark, SF, "events").selectExpr(
        "user_id", "unix_micros(ts) AS t_us").collect()
    t0 = min(r.t_us for r in ev); t1 = max(r.t_us for r in ev)
    top = (1 << evan.ZORDER_BITS) - 1
    span_s = (t1 - t0) // 1_000_000
    def zbucket(u, t_us):
        secs = (t_us - t0) // 1_000_000
        u16 = (u - u_lo) * top // max(u_hi - u_lo, 1)
        h16 = secs * top // max(span_s, 1)
        z = 0
        for i in range(evan.ZORDER_BITS):
            z |= ((u16 >> i) & 1) << (2 * i)
            z |= ((h16 >> i) & 1) << (2 * i + 1)
        return z >> evan.ZORDER_BUCKET_SHIFT
    for r in ev:
        hour = (r.t_us - t0) // 1_000_000 // 3600
        if u_a <= r.user_id <= u_b and h_a <= hour <= h_b:
            assert zbucket(r.user_id, r.t_us) in scanned
