"""Round-4 batch-20 operators: centroid-distance OOD pruning, A/B
experiment analysis, and exact sliding-window distinct counts. Each
pinned by a Python replay over the real corpus plus the semantic edge
each operator exists for (cluster-relative threshold, windowed
attribution + chi-square boundary, pane enumeration vs a direct
interval recount).
"""

from __future__ import annotations

from datetime import timedelta

from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ OOD centroid


def test_ood_agrees_with_kmeans_clusters(spark):
    """The clustering the OOD gate normalizes within must be literally
    the audited kmeans assignment (the CTE-splice contract)."""
    km = {r.vec_id: r.cluster for r in fsim.kmeans_assign(spark, SF).collect()}
    out = fsim.ood_centroid(spark, SF).collect()
    assert {r.vec_id: r.cluster for r in out} == km


def test_ood_verdict_is_cluster_relative(spark):
    """Verdict replay from the entry's own distances: OOD iff
    dist * n * DEN > NUM * sum(dist) within the vector's cluster —
    and the gate actually separates the corpus."""
    rows = fsim.ood_centroid(spark, SF).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    n_ood = 0
    for members in by_cluster.values():
        s = sum(m.dist_e6 for m in members)
        n = len(members)
        for m in members:
            expect = m.dist_e6 * n * fsim.OOD_FACTOR_DEN > fsim.OOD_FACTOR_NUM * s
            assert m.is_ood == expect
            assert m.n_members == n
            n_ood += m.is_ood
    assert 0 < n_ood < len(rows)


# ------------------------------------------------ A/B test


def _variant(user_id: int) -> int:
    h1 = (user_id % fsplit.LEHMER_P) * fsplit.LEHMER_A % fsplit.LEHMER_P
    return h1 * fsplit.LEHMER_A % fsplit.LEHMER_P % 2


def test_ab_test_python_replay(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    per_user: dict = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r)

    arms = {0: [0, 0], 1: [0, 0]}  # variant -> [n_users, n_conv]
    for u, rows in per_user.items():
        sign = [r.ts for r in rows if r.event_type == evan.AB_EXPOSE]
        if not sign:
            continue
        t0 = min(sign)
        hi = t0 + timedelta(hours=evan.AB_WINDOW_H)
        conv = any(
            r.event_type == evan.AB_CONVERT and t0 < r.ts <= hi for r in rows
        )
        arms[_variant(u)][0] += 1
        arms[_variant(u)][1] += conv

    out = {r.variant: r for r in evan.ab_test(spark, SF).collect()}
    assert set(out) == {0, 1}
    (n1, c1), (n2, c2) = arms[0], arms[1]
    for v in (0, 1):
        n, c = arms[v]
        assert (out[v].n_users, out[v].n_conv) == (n, c)
        assert out[v].conv_e6 == c * 1_000_000 // n
    d = c1 * n2 - c2 * n1
    nt, ct = n1 + n2, c1 + c2
    sig = evan.AB_CHI2_DEN * nt * d * d > evan.AB_CHI2_NUM * n1 * n2 * ct * (nt - ct)
    assert out[0].significant == out[1].significant == sig


def test_ab_chi2_boundary_exactness():
    """The cross-multiplied comparison must equal the float chi-square
    at 3.8415 on both sides of the boundary."""
    for n1, c1, n2, c2 in [(100, 30, 100, 15), (100, 30, 100, 25),
                           (50, 50, 50, 0), (50, 0, 50, 0)]:
        nt, ct = n1 + n2, c1 + c2
        d = c1 * n2 - c2 * n1
        got = evan.AB_CHI2_DEN * nt * d * d > evan.AB_CHI2_NUM * n1 * n2 * ct * (nt - ct)
        if 0 < ct < nt:
            chi2 = nt * d * d / (n1 * n2 * ct * (nt - ct))
            assert got == (chi2 > evan.AB_CHI2_NUM / evan.AB_CHI2_DEN)
        else:
            assert got is False  # degenerate arms are never significant


# ------------------------------------------------ sliding distinct


def test_sliding_distinct_python_replay(spark):
    ev = load_table(spark, SF, "events").select("ts", "user_id").collect()
    panes: dict = {}
    step, width = evan.SLIDE_STEP_US, evan.SLIDE_WINDOW_US
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        for k in range(width // step):
            ws = (us // step - k) * step
            panes.setdefault(ws, []).append(r.user_id)

    out = {r.win_start_us: r for r in evan.sliding_distinct(spark, SF).collect()}
    assert set(out) == set(panes)
    for ws, users in panes.items():
        assert out[ws].n_events == len(users)
        assert out[ws].n_users == len(set(users))


def test_sliding_panes_cover_exact_interval(spark):
    """Pane membership must equal the direct interval definition:
    an event is in pane ws iff ws <= us < ws + window."""
    ev = load_table(spark, SF, "events").select("ts").collect()
    uss = [int(r.ts.timestamp() * 1_000_000) for r in ev]
    out = evan.sliding_distinct(spark, SF).collect()
    step, width = evan.SLIDE_STEP_US, evan.SLIDE_WINDOW_US
    for r in out[:50]:
        ws = r.win_start_us
        assert ws % step == 0
        direct = sum(1 for us in uss if ws <= us < ws + width)
        assert r.n_events == direct
