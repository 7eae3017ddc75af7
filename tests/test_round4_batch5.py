"""Round-4 batch-5 operators: the last classic TPC-H query shapes
(Q2/Q6/Q7/Q9/Q12/Q16/Q21 analogues), pinned by semantic invariants at
smoke scale. The oracle gate proves value-exactness; these tests pin
what each shape MEANS, so a refactor that also changes the oracle can't
silently change semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dnstap2clickhouse_spark.plans import tpch
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _round_ha(v: float) -> int:
    """SQL-compatible round: half away from zero on the EXACT binary
    value (Python's built-in round() is banker's half-to-even, which
    disagrees with Spark/DuckDB on exact .5 values — e.g. 62.5 cents;
    the floor(abs+0.5) idiom mis-rounds values 1 ulp below a half).
    Decimal(float) is exact, and decimal ROUND_HALF_UP is away-from-zero
    — the same rule as Spark's BigDecimal rounding."""
    import decimal

    return int(
        decimal.Decimal(v).quantize(decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP)
    )


def test_forecast_revenue_matches_manual_filter(spark):
    """Q6: the one-row sum equals a hand-rolled recomputation of the
    same predicate band (discount compared on exact integer percent)."""
    row = tpch.forecast_revenue(spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem")
    manual = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.round(F.col("l_discount") * 100).cast("bigint").between(5, 7))
            & (F.col("l_quantity") < 24)
        )
        .select(F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000).cast("bigint").alias("e4"))
        .agg(F.sum("e4").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    assert row.n_lines == manual.n > 0
    assert row.revenue_e4 == manual.s


def test_volume_shipping_is_bilateral_and_disjoint(spark):
    """Q7: every returned nation pair crosses the two regions in one of
    the two directions, and no pair appears with a nation trading with
    its own region."""
    rows = tpch.volume_shipping(spark, SF).collect()
    assert rows
    nation = {
        r.n_name: r.r_name
        for r in load_table(spark, SF, "nation")
        .join(load_table(spark, SF, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_name", "r_name")
        .collect()
    }
    for r in rows:
        sr, cr = nation[r.supp_nation], nation[r.cust_nation]
        assert {sr, cr} == {tpch.Q7_REGION_A, tpch.Q7_REGION_B}
        assert r.revenue_e4 > 0


def test_product_profit_part_family_only(spark):
    """Q9: the aggregate only covers lineitems whose part name matches
    the family pattern — group count equals a manual recount."""
    df = tpch.product_profit(spark, SF)
    rows = df.collect()
    assert rows
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part").filter(F.col("p_name").like(tpch.Q9_PART_LIKE))
    n_groups = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(load_table(spark, SF, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(load_table(spark, SF, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(load_table(spark, SF, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("n_name", F.year("o_orderdate").alias("y"))
        .distinct()
        .count()
    )
    assert len(rows) == n_groups


def test_shipmode_priority_partitions_lines(spark):
    """Q12: high + low counts partition the late-shipped lines of the
    window year — totals add up and no flag is double counted."""
    rows = tpch.shipmode_priority(spark, SF).collect()
    assert rows
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {tpch.LATE_SHIP_DAYS} DAY"))
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == late > 0


def test_supplier_cnt_excludes_complaint_suppliers(spark):
    """Q16: no excluded (low-acctbal) supplier contributes to any
    group's distinct count."""
    rows = tpch.supplier_cnt(spark, SF).collect()
    assert rows
    supp = load_table(spark, SF, "supplier")
    excluded = {
        r.s_suppkey for r in supp.filter(F.col("s_acctbal") < tpch.COMPLAINT_BAL).collect()
    }
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    pairs = (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(
            (F.col("p_brand") != tpch.SMALL_QTY_BRAND)
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(*tpch.Q16_SIZES)
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .collect()
    )
    manual = {}
    for p in pairs:
        if p.l_suppkey in excluded:
            continue
        manual.setdefault((p.p_brand, p.p_type, p.p_size), set()).add(p.l_suppkey)
    got = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt for r in rows}
    assert got == {k: len(v) for k, v in manual.items()}


def test_waiting_suppliers_sole_late_semantics(spark):
    """Q21: every counted (supplier, order) incident has (a) another
    supplier on the order and (b) no OTHER supplier late on it —
    recomputed imperatively from the raw tables."""
    rows = tpch.waiting_suppliers(spark, SF).collect()
    li = load_table(spark, SF, "lineitem").collect()
    orders = {r.o_orderkey: r for r in load_table(spark, SF, "orders").collect()}
    region_supp = {
        r.s_suppkey: r.s_name
        for r in load_table(spark, SF, "supplier")
        .join(load_table(spark, SF, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(load_table(spark, SF, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == tpch.Q21_REGION)
        .collect()
    }
    import datetime

    by_order: dict = {}
    for l in li:
        by_order.setdefault(l.l_orderkey, []).append(l)
    expected: dict = {}
    late = lambda l, o: l.l_shipdate > o.o_orderdate + datetime.timedelta(days=tpch.LATE_SHIP_DAYS)
    for ok, lines in by_order.items():
        o = orders[ok]
        if o.o_orderstatus != "F":
            continue
        for l1 in lines:
            if l1.l_suppkey not in region_supp or not late(l1, o):
                continue
            others = [l for l in lines if l.l_suppkey != l1.l_suppkey]
            if others and not any(late(l, o) for l in others):
                name = region_supp[l1.l_suppkey]
                expected[name] = expected.get(name, 0) + 1
    assert {r.s_name: r.numwait for r in rows} == expected
    assert expected  # non-degenerate at this SF


def test_min_cost_supplier_achieves_minimum(spark):
    """Q2: each returned (part, supplier) pair's unit cost equals the
    minimum over ALL region-local suppliers of that part, and every
    returned part belongs to the type/size class."""
    rows = tpch.min_cost_supplier(spark, SF).collect()
    assert rows
    part = {
        r.p_partkey: r
        for r in load_table(spark, SF, "part")
        .filter((F.col("p_type") == tpch.Q2_TYPE) & (F.col("p_size") >= tpch.Q2_MIN_SIZE))
        .collect()
    }
    eu = {
        r.s_suppkey
        for r in load_table(spark, SF, "supplier")
        .join(load_table(spark, SF, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(load_table(spark, SF, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == tpch.Q2_REGION)
        .collect()
    }
    cost: dict = {}
    for l in load_table(spark, SF, "lineitem").collect():
        if l.l_suppkey not in eu or l.l_partkey not in part:
            continue
        c = _round_ha(l.l_extendedprice / l.l_quantity * 100)
        k = (l.l_partkey, l.l_suppkey)
        cost[k] = min(cost.get(k, c), c)
    per_part_min: dict = {}
    for (pk, _), c in cost.items():
        per_part_min[pk] = min(per_part_min.get(pk, c), c)
    for r in rows:
        assert r.p_partkey in part
        assert r.unit_cents == per_part_min[r.p_partkey]
    # completeness: every part with an achievable min appears
    assert {r.p_partkey for r in rows} == set(per_part_min)


def test_domain_mix_quotas_and_proportions(spark):
    """Domain mix: per-source kept counts equal the integer quota
    formula, no source is upsampled, and the realized mixture tracks
    the weights (exact up to the documented floor)."""
    from dnstap2clickhouse_spark.functions import splits as fsplit

    rows = fsplit.domain_mix(spark, SF).collect()
    assert rows
    kept: dict = {}
    for r in rows:
        kept[r.source] = kept.get(r.source, 0) + 1
    # recompute quotas from raw counts
    docs = load_table(spark, SF, "documents").groupBy("source").count().collect()
    n = {r.source: r["count"] for r in docs}
    w = {s: 1 + int(s[3:]) % 4 for s in n}
    w_tot = sum(w.values())
    budget = min(c * w_tot // w[s] for s, c in n.items())
    quota = {s: budget * w[s] // w_tot for s in n}
    assert kept == {s: q for s, q in quota.items() if q > 0}
    for s in kept:
        assert kept[s] <= n[s]  # never upsamples
    # keep_s/n_s ratio is monotone in weight for equal-sized sources
    by_w: dict = {}
    for s, q in quota.items():
        by_w.setdefault(w[s], set()).add(q)
    ws = sorted(by_w)
    assert all(max(by_w[a]) <= min(by_w[b]) for a, b in zip(ws, ws[1:]))


def test_domain_mix_partitioning_independent(spark):
    """The survivor set is identical after an adversarial repartition
    (hash-rank selection, not row order)."""
    from dnstap2clickhouse_spark.functions import splits as fsplit

    base = {r.doc_id for r in fsplit.domain_mix(spark, SF).collect()}
    # same computation over a deliberately reshuffled input frame
    shuffled = (
        load_table(spark, SF, "documents")
        .repartition(17, "lang")
        .sortWithinPartitions(F.desc("doc_id"))
    )
    again = {r.doc_id for r in fsplit.domain_mix_df(shuffled).collect()}
    assert base == again


def test_heavy_hitters_cms_invariants(spark):
    """CMS: the estimate never underestimates, is exact for
    collision-free keys, and the selection matches the threshold
    recomputed from raw counts."""
    from dnstap2clickhouse_spark.plans import events_analytics as evan

    rows = evan.heavy_hitters(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.exact_cnt
        assert r.never_underestimates
    # recompute the gate from the raw table
    ev = load_table(spark, SF, "events")
    counts = {r.user_id: r["count"] for r in ev.groupBy("user_id").count().collect()}
    total, n_users = sum(counts.values()), len(counts)
    # selection is sketch-driven: every user whose EXACT count passes the
    # gate must appear (overestimates can only add users, never drop them)
    exact_pass = {u for u, c in counts.items() if c * evan.HH_DEN * n_users >= evan.HH_NUM * total}
    got = {r.user_id for r in rows}
    assert exact_pass <= got
    # and estimates match a hand-built CMS
    sketch: dict = {}
    for u, c in counts.items():
        for j, a in enumerate(evan.CMS_MULTIPLIERS):
            b = ((u % evan.CMS_P) * a % evan.CMS_P) % evan.CMS_WIDTH
            sketch[(j, b)] = sketch.get((j, b), 0) + c
    for r in rows:
        est = min(
            sketch[(j, ((r.user_id % evan.CMS_P) * a % evan.CMS_P) % evan.CMS_WIDTH)]
            for j, a in enumerate(evan.CMS_MULTIPLIERS)
        )
        assert r.cms_est == est


def test_pq_codes_match_numpy(spark):
    """PQ: codes reproduce a numpy reimplementation of the same
    algorithm (e9 quantization, seed init, one exact-integer Lloyd
    round per subspace, fixed-order distances, ties to lowest id)."""
    import numpy as np

    from dnstap2clickhouse_spark.functions import similarity as fsim

    rows = fsim.pq_codes(spark, SF).collect()
    assert rows
    got = {(r.vec_id, r.sub): r.code for r in rows}
    emb = {
        r.vec_id: np.array(
            [_round_ha(float(x) * fsim._E9) for x in r.embedding], dtype=np.int64
        )
        for r in load_table(spark, SF, "embeddings").collect()
    }
    m, sd, k = fsim.PQ_SUBS, fsim.PQ_SUBDIM, fsim.PQ_K
    for sub in range(m):
        sv = {v: e[sub * sd : (sub + 1) * sd] for v, e in emb.items()}
        # seed centroids as (sum, n) pairs
        cent = {c: (sv[c].copy(), 1) for c in range(k)}

        def assign(cent):
            out = {}
            for v, x in sv.items():
                best, bd = None, None
                for c in sorted(cent):
                    s, n = cent[c]
                    diff = (x * n - s).astype(np.float64)
                    d = 0.0
                    for t in diff * diff:  # fixed-order left fold
                        d += t
                    d /= float(n * n)
                    if bd is None or d < bd:
                        best, bd = c, d
                out[v] = best
            return out

        a1 = assign(cent)
        upd: dict = {}
        for v, c in a1.items():
            s, n = upd.get(c, (np.zeros(sd, dtype=np.int64), 0))
            upd[c] = (s + sv[v], n + 1)
        a2 = assign(upd)
        for v in sv:
            assert got[(v, sub)] == a2[v], (v, sub)
    # every vector has exactly m codes, all within [0, k)
    assert len(rows) == len(emb) * m
    assert all(0 <= r.code < k for r in rows)


def test_streaming_session_window_merges_across_batches(spark):
    """A session engineered to straddle the chunk-1/chunk-2 time
    boundary arrives split across two micro-batches and MUST come back
    merged as one session (state-store merge), while the tail session
    inside the watermark horizon MUST be withheld (append-mode
    finalization)."""
    import datetime

    from dnstap2clickhouse_spark.streaming import pipeline as stp

    t0 = datetime.datetime(2001, 1, 1)
    h = 3600

    def ev(eid, uid, sec):
        return (eid, t0 + datetime.timedelta(seconds=sec), uid, 1.0)

    # corpus span 0..40000s → 4 chunks of 10000s each. User 1's pair
    # brackets the 20000s boundary 10 min apart (< 30 min gap): the two
    # events land in chunk 1 and chunk 2 micro-batches but form ONE
    # session. User 2's tail event sits at the corpus max (inside the
    # 1 h watermark horizon) and must not be emitted.
    rows_in = [
        ev(0, 1, 0),  # chunk 0 anchor (corpus min)
        ev(1, 1, 20000 - 300),
        ev(2, 1, 20000 + 300),
        ev(3, 2, 5000),
        ev(4, 2, 40000),  # corpus max; unfinalized tail
    ]
    df = spark.createDataFrame(
        rows_in, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    )
    out = stp.streaming_session_window_df(spark, df).collect()
    got = {(r.user_id, r.n) for r in out}
    # user 1: the boundary pair merged into one 2-event session + the anchor
    assert (1, 2) in got and (1, 1) in got
    # user 2: only the early session; the tail one is withheld
    assert (2, 1) in got
    assert len(out) == 3
    gap = stp.SESSION_STREAM_GAP_S
    for r in out:
        assert (r.sessionEnd - r.sessionStart).total_seconds() >= gap


def test_pq_adc_matches_numpy(spark):
    """ADC: the top-k per query reproduces a numpy reimplementation
    (same codebooks, same LUT distances, same in-order sums, same
    tie-breaks)."""
    import numpy as np

    from dnstap2clickhouse_spark.functions import similarity as fsim

    rows = fsim.pq_adc_topk(spark, SF).collect()
    assert rows
    emb = {
        r.vec_id: np.array(
            [_round_ha(float(x) * fsim._E9) for x in r.embedding], dtype=np.int64
        )
        for r in load_table(spark, SF, "embeddings").collect()
    }
    m, sd, k = fsim.PQ_SUBS, fsim.PQ_SUBDIM, fsim.PQ_K

    def fold_dist(x, s, n):
        diff = (x * n - s).astype(np.float64)
        d = 0.0
        for t in diff * diff:
            d += t
        return d / float(n * n)

    codes: dict = {}
    cbs: dict = {}
    for sub in range(m):
        sv = {v: e[sub * sd : (sub + 1) * sd] for v, e in emb.items()}
        cent = {c: (sv[c].copy(), 1) for c in range(k)}

        def assign(cent):
            out = {}
            for v, x in sv.items():
                best, bd = None, None
                for c in sorted(cent):
                    d = fold_dist(x, *cent[c])
                    if bd is None or d < bd:
                        best, bd = c, d
                out[v] = best
            return out

        a1 = assign(cent)
        upd: dict = {}
        for v, c in a1.items():
            s, n = upd.get(c, (np.zeros(sd, dtype=np.int64), 0))
            upd[c] = (s + sv[v], n + 1)
        cbs[sub] = upd
        for v, c in assign(upd).items():
            codes[(v, sub)] = c
    expected = {}
    for q in range(fsim.N_QUERIES):
        lut = {
            (sub, c): fold_dist(emb[q][sub * sd : (sub + 1) * sd], *cbs[sub][c])
            for sub in range(m)
            for c in cbs[sub]
        }
        scored = []
        for v in emb:
            adc = 0.0
            for sub in range(m):
                adc += lut[(sub, codes[(v, sub)])]
            scored.append((adc, v))
        scored.sort()
        for rank, (adc, v) in enumerate(scored[: fsim.TOP_K], 1):
            expected[(q, rank)] = (v, adc)
    got = {(r.query_id, r.rank): (r.vec_id, r.adc) for r in rows}
    assert got == expected


def test_returned_items_only_returned_revenue(spark):
    """Q10: every ranked customer's revenue recomputes from ONLY
    returnflag='R' lines of the quarter's orders, and ranking is by
    revenue descending with custkey tie-break."""
    rows = tpch.returned_item_customers(spark, SF).collect()
    assert rows
    li = load_table(spark, SF, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, SF, "orders").filter(
        (F.col("o_orderdate") >= F.lit(tpch.Q10_QUARTER_START).cast("timestamp"))
        & (
            F.col("o_orderdate")
            < F.lit(tpch.Q10_QUARTER_START).cast("timestamp") + F.expr("INTERVAL 3 MONTH")
        )
    )
    manual = {
        r.o_custkey: r.s
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(F.expr(tpch._DISC_E4)).alias("s"))
        .collect()
    }
    for r in rows:
        assert _round_ha(r.revenue * 10000) == manual[r.c_custkey]
    revs = [(r.revenue, -r.c_custkey) for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_streaming_response_join_buffers_across_batches(spark):
    """A query arriving in one micro-batch must be matched by its
    response arriving in a LATER micro-batch (symmetric join state
    buffering), and a response outside the 10-minute bound must not
    match."""
    import datetime

    from dnstap2clickhouse_spark.streaming import pipeline as stp

    t0 = datetime.datetime(2001, 1, 1)

    def ev(eid, sec):
        return (eid, t0 + datetime.timedelta(seconds=sec), 1, "click", 1.0)

    # span 0..40000s → 4 chunks of 10000s. Pair key = event_id div 2.
    # key 5: query (id 10) at 9950s (chunk 0), response (id 11) at
    # 10050s (chunk 1) — 100s apart, MUST match across the batch
    # boundary. key 6: response (id 13) arrives 11 min after its query
    # (id 12) — outside the bound, must NOT match. Anchors pin the
    # corpus span.
    rows = [
        ev(0, 0),  # anchor min
        ev(10, 9950),
        ev(11, 10050),
        ev(12, 20000),
        ev(13, 20000 + 660),
        ev(2, 40000),  # anchor max (even id: a query with no response)
    ]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )
    out = stp.streaming_response_join_df(spark, df).collect()
    assert len(out) == 1
    assert out[0].delta_us == 100 * 1_000_000


def test_ivfpq_candidates_come_from_probed_cells(spark):
    """IVF-PQ: every returned neighbor lives in one of its query's
    probed cells, and each pair's ADC score equals the standalone ADC
    entry's score for that pair (same codebooks, same LUT)."""
    from dnstap2clickhouse_spark.functions import similarity as fsim

    rows = fsim.ivfpq_topk(spark, SF).collect()
    assert rows
    # rebuild assignment + probe sets from the SHARED production CTE
    # fragment (one query serves both: rn = 1 is the assignment, rn <=
    # IVF_NPROBE on the query ids is the probe set)
    fsim._register(spark, SF)
    ranked = spark.sql(
        f"WITH {fsim._ivf_cell_ctes('spark')} "
        "SELECT vec_id, label, rn FROM cell_ranked"
    ).collect()
    cell = {r.vec_id: r.label for r in ranked if r.rn == 1}
    probes = {}
    for r in ranked:
        if r.vec_id < fsim.N_QUERIES and r.rn <= fsim.IVF_NPROBE:
            probes.setdefault(r.vec_id, set()).add(r.label)
    for r in rows:
        assert cell[r.neighbor_id] in probes[r.query_id], (r.query_id, r.neighbor_id)
    # cross-entry consistency: IVF-PQ's adc equals the full-ADC entry's
    # score for pairs both report
    full = {(r.query_id, r.vec_id): r.adc for r in fsim.pq_adc_topk(spark, SF).collect()}
    shared = [(r.query_id, r.neighbor_id, r.adc) for r in rows if (r.query_id, r.neighbor_id) in full]
    assert shared  # the probed cells contain some of the global top-k
    for q, nb, adc in shared:
        assert adc == full[(q, nb)]


def test_ivfpq_recall_bounded_by_ivf_recall(spark):
    """IVF-PQ adds quantization error on top of cell pruning, so its
    per-query recall can't exceed plain IVF's on the same probe set —
    and both are proper fractions of TOP_K."""
    from dnstap2clickhouse_spark.functions import similarity as fsim

    pq = {r.query_id: r.n_hits for r in fsim.ivfpq_recall(spark, SF).collect()}
    ivf = {r.query_id: r.n_hits for r in fsim.ivf_recall(spark, SF).collect()}
    assert set(pq) == set(ivf) == set(range(fsim.N_QUERIES))
    for q in pq:
        assert 0 <= pq[q] <= fsim.TOP_K
        assert pq[q] <= ivf[q]


def test_rocksdb_state_store_equivalence(spark):
    """The production state backend (RocksDBStateStoreProvider) yields
    byte-identical results to the default HDFS-backed provider for both
    stateful shapes added this round (session windows and the
    stream-stream join) — turning the docs' 'RocksDB-ready' claim into
    executed evidence."""
    import datetime

    from dnstap2clickhouse_spark.streaming import pipeline as stp

    t0 = datetime.datetime(2001, 1, 1)

    def ev(eid, sec):
        return (eid, t0 + datetime.timedelta(seconds=sec), 1, "click", 1.0)

    df = spark.createDataFrame(
        [ev(0, 0), ev(10, 9950), ev(11, 10050), ev(12, 20000), ev(2, 40000)],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE",
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    base_sessions = [tuple(r) for r in stp.streaming_session_window_df(spark, df).collect()]
    base_joins = [tuple(r) for r in stp.streaming_response_join_df(spark, df).collect()]
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, rocks)
        assert [tuple(r) for r in stp.streaming_session_window_df(spark, df).collect()] == base_sessions
        assert [tuple(r) for r in stp.streaming_response_join_df(spark, df).collect()] == base_joins
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    assert base_sessions and base_joins


def test_scd2_intervals_partition_time(spark):
    """SCD2: per user, intervals are contiguous (each valid_to equals
    the next valid_from), exactly one open interval exists, and the
    state differs between consecutive intervals."""
    from dnstap2clickhouse_spark.plans import events_analytics as evan

    rows = evan.scd2_history(spark, SF).collect()
    assert rows
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].valid_to is None and ivs[-1].is_current
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state


def test_lateral_topn_matches_window_form(spark):
    """LATERAL top-N must equal the window row_number form (the two
    decorrelation paths agree), and the executed plan contains a window
    rank — not a per-customer nested loop."""
    rows = tpch.lateral_topn_orders(spark, SF)
    got = {(r.c_custkey, r.o_orderkey) for r in rows.collect()}
    cust = load_table(spark, SF, "customer").filter(
        F.col("c_mktsegment") == tpch.LATERAL_SEGMENT
    )
    orders = load_table(spark, SF, "orders")
    from pyspark.sql import Window as W

    win = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
            ),
        )
        .filter(F.col("rk") <= tpch.LATERAL_N)
    )
    expected = {(r.o_custkey, r.o_orderkey) for r in win.collect()}
    assert got == expected
    plan = rows._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_variant_shred_type_dispatch(spark):
    """VARIANT: typed access returns the value for the matching runtime
    type and NULL otherwise, and schema inference names every
    constructed type correctly."""
    from dnstap2clickhouse_spark.plans import events_analytics as evan

    rows = evan.variant_shred(spark, SF).collect()
    assert rows
    for r in rows:
        m = r.event_id % 3
        if m == 0:
            assert r.vtype == "BIGINT" and r.as_int == r.event_id % 100
            assert r.obj_n is None and r.as_str == str(r.event_id % 100)
        elif m == 1:
            assert r.vtype == "STRING" and r.as_int is None and r.obj_n is None
            assert isinstance(r.as_str, str) and not r.as_str.startswith('"')
        else:
            assert r.vtype == "OBJECT<n: BIGINT>"
            assert r.as_int is None and r.obj_n == r.event_id % 50
            assert r.as_str is None


def test_tws_flavor_matches_apply_flavor(spark):
    """transformWithStateInPandas carries the same J1 state machine as
    applyInPandasWithState — identical emitted samples. Skipped where
    the container lacks google.protobuf (the TWS state-server protocol
    dependency); the operator definition is still importable and the
    gate itself is asserted."""
    import pytest

    from dnstap2clickhouse_spark.streaming import match_state as ms
    from dnstap2clickhouse_spark.streaming import pipeline as stp

    # the gate must be consistent with reality: if it claims available,
    # the query must actually run
    if not ms.tws_available():
        with pytest.raises(Exception):
            stp.stateful_match_tws_query(spark, SF).collect()
        pytest.skip("google.protobuf not in this container (TWS protocol dep)")
    a = stp.stateful_match_query(spark, SF).select("responseTime", "identity", "delta_us").collect()
    b = stp.stateful_match_tws_query(spark, SF).select("responseTime", "identity", "delta_us").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
