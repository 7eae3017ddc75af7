"""Round-4 batch-30 operators: banding sweep, PQ distortion, DAU/WAU.
Pins: the sweep's production point equals the standalone LSH entries
and its verified count is band-invariant on this corpus, distortion
replays from the standalone ADC + exact numpy folds, and the DAU/WAU
replay with the window identity.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from dnstap2clickhouse_spark.functions import dedup as fdedup
from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ band sweep


def test_band_sweep_production_point(spark):
    sweep = {r.n_bands: r for r in fdedup.band_sweep(spark, SF).collect()}
    assert set(sweep) == set(fdedup.BAND_SWEEP)
    # the production banding (BANDS) must reproduce the standalone chain
    cand = fdedup.minhash_lsh_pairs(spark, SF).count()
    ver = fdedup.lsh_verified_pairs(spark, SF).count()
    assert sweep[fdedup.BANDS].n_candidates == cand
    assert sweep[fdedup.BANDS].n_verified == ver
    # S-curve: candidates grow with band count; verified pairs are
    # bounded by candidates and never exceed the widest config's
    counts = [sweep[b].n_candidates for b in sorted(sweep)]
    assert counts == sorted(counts)
    assert all(r.cand_monotone for r in sweep.values())
    for r in sweep.values():
        assert r.n_verified <= r.n_candidates
        assert r.rows_per_band == fdedup.N_HASHES // r.n_bands


# ------------------------------------------------ PQ distortion


def test_pq_distortion_replays_from_adc(spark):
    adc = defaultdict(list)
    for r in fsim.pq_adc_topk(spark, SF).collect():
        adc[r.query_id].append((r.vec_id, r.adc))
    emb = {r.vec_id: r.embedding
           for r in load_table(spark, SF, "embeddings").collect()}

    def q(v):
        return [int(Decimal(float(x) * fsim._E9).quantize(0, ROUND_HALF_UP))
                for x in v]

    def exact(a, b):
        acc = 0.0
        for x, y in zip(q(emb[a]), q(emb[b])):
            acc += float(x - y) * float(x - y)
        return acc

    def e6(x):
        return int(Decimal(x / 1e12).quantize(0, ROUND_HALF_UP))

    out = {r.query_id: r for r in fsim.pq_distortion(spark, SF).collect()}
    assert set(out) == set(adc)
    for qid, pairs in adc.items():
        got = out[qid]
        assert got.n_pairs == len(pairs)
        adcs = [e6(d) for _, d in pairs]
        exs = [e6(exact(qid, v)) for v, _ in pairs]
        assert got.mean_adc_e6 == sum(adcs) // len(adcs)
        assert got.mean_exact_e6 == sum(exs) // len(exs)
        assert got.mean_abs_err_e6 == \
            sum(abs(a - b) for a, b in zip(adcs, exs)) // len(adcs)
    # with PQ_K=4 codewords the ADC systematically underestimates
    # (centroids are interior points) — the distortion is real, not 0
    assert all(r.mean_abs_err_e6 > 0 for r in out.values())


# ------------------------------------------------ DAU / WAU


def test_dau_wau_python_replay(spark):
    ev = load_table(spark, SF, "events").select("ts", "user_id").collect()
    by_day: dict = defaultdict(set)
    for r in ev:
        by_day[int(r.ts.timestamp() * 1_000_000) // 86_400_000_000].add(r.user_id)

    out = {r.day: r for r in evan.dau_wau(spark, SF).collect()}
    assert set(out) == set(by_day)
    for d, users in by_day.items():
        wau = set()
        for k in range(evan.WAU_DAYS):
            wau |= by_day.get(d - k, set())
        got = out[d]
        assert (got.dau, got.wau) == (len(users), len(wau))
        assert got.stickiness_e6 == len(users) * 1_000_000 // len(wau)
        assert got.dau <= got.wau  # window identity
