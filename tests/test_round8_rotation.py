"""Round-8 rotation + replica-gate fixes (r7 verdict items 3 & 4,
r7 ADVICE).

1. Code-change-aware rotation: an entry whose implementing module
   changed in a git round AFTER its last adjudication (and at/after the
   activation floor) is treated as never-adjudicated and sorts to the
   front of ``queries()`` — so the driver re-sees edited code the very
   next round instead of waiting a full ~5-round cycle (the
   ``events_sketch_stats`` failure mode, stale r3 -> reworked r4 ->
   first re-adjudication r8).
2. The r8 adjudication window itself stays pinned to what the r7
   verdict prescribed (DNS spine + events_sketch_stats) until the
   driver records CORRECTNESS_r08.
3. The ``--sampled`` replica-gate composition in
   tools/check_correctness.py: deterministic pair-key sample applied
   identically in both engines, converting the two sf1 degrades into
   value evidence.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as entrymod

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


# --------------------------------------------------------------- unit: void rule

def _fake_entry(module_file: str):
    """An entry callable whose module resolution we control via a map."""
    def fn(spark, sf_dir):  # pragma: no cover - never called
        raise AssertionError
    fn.__fake_file__ = module_file
    return fn


def test_edited_entry_sorts_ahead_of_untouched(monkeypatch):
    """An entry whose module changed post-adjudication (round >= floor)
    voids to the front — ahead of untouched entries that are NOT stale
    (recently adjudicated), and ahead of merely-old untouched entries."""
    qdict = {
        "untouched_fresh": _fake_entry("m/fresh.py"),     # adjudicated 7
        "untouched_old": _fake_entry("m/old.py"),         # adjudicated 3
        "edited_post_adjudication": _fake_entry("m/hot.py"),  # adjudicated 7, edited 8
    }
    monkeypatch.setattr(
        entrymod, "_last_adjudicated",
        lambda names: {"untouched_fresh": 7, "untouched_old": 3,
                       "edited_post_adjudication": 7},
    )
    monkeypatch.setattr(
        entrymod, "_file_edit_rounds",
        lambda: {"m/hot.py": 8, "m/fresh.py": 5, "m/old.py": 2},
    )
    monkeypatch.setattr(
        entrymod, "_entry_module_files", lambda fn: {fn.__fake_file__}
    )
    order = list(entrymod._rotate(qdict))
    assert order[0] == "edited_post_adjudication"
    assert order == ["edited_post_adjudication", "untouched_old", "untouched_fresh"]


def test_pre_floor_edits_are_grandfathered(monkeypatch):
    """Edits older than _EDIT_VOID_FLOOR never void evidence: the r6/r7
    full local sweeps already re-verified the contract after them, and
    retro-voiding would displace the verdict-pinned r8 window."""
    qdict = {
        "old_stale": _fake_entry("m/a.py"),    # adjudicated 3, untouched
        "edited_r7": _fake_entry("m/b.py"),    # adjudicated 5, edited 7 (< floor)
    }
    monkeypatch.setattr(
        entrymod, "_last_adjudicated", lambda names: {"old_stale": 3, "edited_r7": 5}
    )
    monkeypatch.setattr(
        entrymod, "_file_edit_rounds", lambda: {"m/a.py": 1, "m/b.py": 7}
    )
    monkeypatch.setattr(
        entrymod, "_entry_module_files", lambda fn: {fn.__fake_file__}
    )
    assert entrymod._EDIT_VOID_FLOOR == 8
    order = list(entrymod._rotate(qdict))
    assert order == ["old_stale", "edited_r7"]  # plain adjudication order


def test_edit_before_adjudication_does_not_void(monkeypatch):
    """The driver adjudicates the round's FINAL tree: an edit in the same
    round as (or before) the adjudication is covered evidence."""
    qdict = {"covered": _fake_entry("m/c.py"), "older": _fake_entry("m/d.py")}
    monkeypatch.setattr(
        entrymod, "_last_adjudicated", lambda names: {"covered": 8, "older": 7}
    )
    monkeypatch.setattr(
        entrymod, "_file_edit_rounds", lambda: {"m/c.py": 8, "m/d.py": 1}
    )
    monkeypatch.setattr(
        entrymod, "_entry_module_files", lambda fn: {fn.__fake_file__}
    )
    assert list(entrymod._rotate(qdict)) == ["older", "covered"]


# ------------------------------------------------- real-tree resolution

def test_module_resolution_real_entries():
    qs = entrymod.queries()
    # lambda declared in the entry file -> its referenced engine module
    # (plus, since r9, one level of that module's package-internal
    # imports — see test_round9_fixes.py for the transitive cases)
    assert "dnstap2clickhouse_spark/streaming/pipeline.py" in (
        entrymod._entry_module_files(qs["dns_stateful_match"])
    )
    # direct function ref -> its defining module
    assert "dnstap2clickhouse_spark/plans/tpch.py" in (
        entrymod._entry_module_files(qs["tpch_pricing_summary"])
    )
    # the entry file itself is never an implementing module (it changes
    # every round by design and would void everything)
    for name in ("dns_stateful_match", "dedup_minhash_lsh", "events_funnel"):
        assert "__spark_entry__.py" not in entrymod._entry_module_files(qs[name])


def test_every_entry_resolves_to_engine_modules():
    """Resolution coverage: every contract entry maps to at least one
    engine module file (a lambda that resolved to nothing would silently
    opt out of the void rule)."""
    qs = entrymod.queries()
    unresolved = [n for n, fn in qs.items() if not entrymod._entry_module_files(fn)]
    assert unresolved == [], f"entries with no module resolution: {unresolved}"


def test_git_edit_rounds_parse():
    edits = entrymod._file_edit_rounds()
    if not edits:
        pytest.skip("git history unavailable")
    # every edit round lies in [1, newest boundary + 1] — the upper end
    # is the in-progress round (was hardcoded 8 in r8; generalized so the
    # test survives every subsequent round's commits)
    rounds = set(edits.values())
    assert min(rounds) >= 1 and max(rounds) - min(rounds) < 50
    # known ground truth from the git log: similarity.py last changed in
    # the r11 optimization round (the IVF assignment fold; previously r7's
    # auto assignment); dedup.py in the r10/r11 optimization rounds (the
    # banded-LSH SHUFFLE_HASH change, then the containment set-grouping) —
    # their entries void into the next window per the code-change rule,
    # by design
    assert edits["dnstap2clickhouse_spark/functions/similarity.py"] >= 11
    assert edits["dnstap2clickhouse_spark/functions/dedup.py"] >= 10


# The r8 window pin test (R8_WINDOW_HEAD / test_r8_window_pinned_until_
# driver_records_r08) retired once CORRECTNESS_r08 landed — it had become
# a permanent skip (r8 verdict item 6). Its generalized successor,
# test_window_is_least_recently_evidenced_prefix in test_round9_fixes.py,
# re-derives the expected window from the evidence files every round
# instead of pinning one round's names.


# ----------------------------------------- --sampled replica composition

def test_bench_corpus_seed_is_process_stable():
    """r7 ADVICE (medium): the per-table permutation offset must not
    depend on the salted str hash — pin the crc32-derived constants so
    the corpus B instance is regenerable from any interpreter."""
    import zlib

    import make_bench_corpus as mbc

    assert mbc.SEED == 20250816
    assert zlib.crc32(b"documents") % 1000 == 648
    assert zlib.crc32(b"embeddings") % 1000 == 345
    src = open(os.path.join(HERE, "tools", "make_bench_corpus.py")).read()
    # the salted form must never return as CODE (docstring mentions it)
    assert "SEED + hash(" not in src
    assert "SEED + zlib.crc32(name.encode()) % 1000" in src


def test_compare_bench_normalization_and_breach(tmp_path):
    """tools/compare_bench.py: corpus guard, calibration normalization
    (t_norm = t_raw * calib_ref / calib_new), and the 2x breach exit."""
    import json
    import subprocess

    ref = {"corpus_id": "c1", "queries": {"q": 1.0}, "host": {"calib_sec": 1.0}}
    # raw 2.4x, but the host ran 2x slower -> normalized 1.2x, no breach
    new = {"corpus_id": "c1", "queries": {"q": 2.4}, "host": {"calib_sec": 2.0}}
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps(ref))
    b.write_text(json.dumps(new))
    tool = os.path.join(HERE, "tools", "compare_bench.py")
    r = subprocess.run(
        [sys.executable, tool, str(a), str(b)], capture_output=True, text=True
    )
    assert r.returncode == 1 and "2x BREACH" in r.stdout  # raw judges 2.4x
    r = subprocess.run(
        [sys.executable, tool, str(a), str(b), "--normalize"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0 and "BREACH" not in r.stdout  # normalized 1.2x
    # corpus mismatch refuses without --force
    c = tmp_path / "c.json"
    c.write_text(json.dumps({**new, "corpus_id": "c2"}))
    r = subprocess.run(
        [sys.executable, tool, str(a), str(c)], capture_output=True, text=True
    )
    assert r.returncode == 2 and "corpus mismatch" in r.stdout


def test_sampled_recall_sql_composes_both_dialects():
    import check_correctness as cc

    for dialect in ("spark", "duckdb"):
        sql = cc.sampled_minhash_recall_sql(dialect)
        assert sql.count(cc.SAMPLE_PRED) == 2  # both pair CTEs sampled
        assert "exact_pairs" in sql and "lsh_pairs" in sql


def test_sampled_recall_value_exact_at_sf001(spark):
    """Both engines agree on the SAMPLED recall statistic at sf0.01 —
    pins the substring-substitution machinery end-to-end before the sf1
    replica gate relies on it."""
    import duckdb

    import check_correctness as cc
    from tests.oracle_harness import assert_match, run_oracle

    sdf = cc.SAMPLED_VARIANT["dedup_minhash_recall"][0](spark, SF_ORACLE)
    assert_match(
        sdf,
        run_oracle(cc.sampled_minhash_recall_sql("duckdb"), SF_ORACLE),
        "sampled_minhash_recall",
    )


def test_sampled_output_pred_agrees_both_engines(spark):
    """The simhash_pairs output sample: identical predicate, identical
    surviving rows in both engines at sf0.01."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    import check_correctness as cc
    from tests.oracle_harness import assert_match, run_oracle

    sdf = e.queries()["dedup_simhash_pairs"](spark, SF_ORACLE).where(
        F.expr(cc.SAMPLE_PRED)
    )
    osql = f"SELECT * FROM ({e.oracle_sql()['dedup_simhash_pairs']}\n) __samp WHERE {cc.SAMPLE_PRED}"
    assert_match(sdf, run_oracle(osql, SF_ORACLE), "sampled_simhash_pairs")
