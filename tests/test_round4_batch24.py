"""Round-4 batch-24 operators: length-bucketed batching, series
autocorrelation, and the dedup-threshold operating curve. Python
replays plus each operator's reason-to-exist: bucketing must beat the
unbucketed padded collate, the ACF must agree with the backtest's
no-seasonality verdict, and the sweep must agree with the fixed-
threshold dedup entry at its own operating point.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ length buckets


def _order_key(doc_id: int) -> int:
    h1 = (doc_id % fsplit.LEHMER_P) * fsplit.LEHMER_A % fsplit.LEHMER_P
    return h1 * fsplit.LEHMER_A % fsplit.LEHMER_P % fsplit.LEHMER_P


def test_length_buckets_python_replay(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    per_bucket: dict = defaultdict(list)
    for d in docs:
        n = len(d.text.split(" "))
        b = next((i for i, t in enumerate(fsplit.LB_BOUNDS) if n <= t),
                 len(fsplit.LB_BOUNDS))
        per_bucket[b].append((_order_key(d.doc_id), d.doc_id, n))

    expect = {}
    for b, rows in per_bucket.items():
        rows.sort()
        for i in range(0, len(rows), fsplit.LB_BATCH):
            chunk = [n for _, _, n in rows[i : i + fsplit.LB_BATCH]]
            expect[(b, i // fsplit.LB_BATCH)] = (
                len(chunk), max(chunk), sum(chunk),
                max(chunk) * len(chunk) - sum(chunk),
            )

    out = {(r.bucket, r.batch): (r.n_docs, r.max_tok, r.sum_tok, r.pad_waste)
           for r in fsplit.length_buckets(spark, SF).collect()}
    assert out == expect


def test_length_buckets_beat_unbucketed(spark):
    """The whole point: total padding waste under bucketing must be
    lower than batching the same hash order without buckets."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    lens = [(_order_key(d.doc_id), d.doc_id, len(d.text.split(" ")))
            for d in docs]
    lens.sort()
    baseline = 0
    for i in range(0, len(lens), fsplit.LB_BATCH):
        chunk = [n for _, _, n in lens[i : i + fsplit.LB_BATCH]]
        baseline += max(chunk) * len(chunk) - sum(chunk)

    bucketed = sum(r.pad_waste for r in fsplit.length_buckets(spark, SF).collect())
    assert bucketed < baseline


# ------------------------------------------------ autocorrelation


def test_autocorrelation_python_replay(spark):
    ev = load_table(spark, SF, "events").select("ts").collect()
    hourly: dict = defaultdict(int)
    for r in ev:
        hourly[int(r.ts.timestamp() * 1_000_000) // 3_600_000_000] += 1

    out = {r.lag: r for r in evan.autocorrelation(spark, SF).collect()}
    assert set(out) == set(evan.ACF_LAGS)
    for lag in evan.ACF_LAGS:
        pairs = [(n, hourly[h + lag]) for h, n in hourly.items()
                 if h + lag in hourly]
        np_, got = len(pairs), out[lag]
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        assert (got.np, got.sx, got.sy, got.sxx, got.syy, got.sxy) == \
            (np_, sx, sy, sxx, syy, sxy)
        r = (np_ * sxy - sx * sy) / (
            ((np_ * sxx - sx * sx) * (np_ * syy - sy * sy)) ** 0.5
        )
        assert got.r_e6 == int(Decimal(r * 1_000_000).quantize(0, ROUND_HALF_UP))
        # synthetic arrivals are memoryless: both lags sit near zero,
        # consistent with events_seasonal_baseline's global-mean wins
        assert abs(got.r_e6) < 200_000


# ------------------------------------------------ threshold sweep


def test_threshold_sweep_python_replay_and_consistency(spark):
    pairs = fsim.embedding_lsh_dups(spark, SF).collect()  # fixed threshold
    sweep = {r.t_e2: r for r in fsim.threshold_sweep(spark, SF).collect()}
    assert set(sweep) == set(fsim.SWEEP_THRESHOLDS_E2)
    # the sweep's point at the production threshold equals the dedup
    # entry's pair count (same candidate chain, same fold)
    t_prod = int(fsim.COSINE_DUP_THRESHOLD * 100)
    assert t_prod in sweep
    assert sweep[t_prod].n_pairs == len(pairs)
    # curve is non-increasing and the certificate says so
    ts = sorted(sweep)
    counts = [sweep[t].n_pairs for t in ts]
    assert counts == sorted(counts, reverse=True)
    assert all(r.monotone_ok for r in sweep.values())
