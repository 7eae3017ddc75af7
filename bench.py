"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Output (r10):
the FULL artifact {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf", "corpus_id", "protocol", "runs", "host",
"flagship"} is printed first and written to bench_full.json; the FINAL
stdout line is a compact <=1500-char summary (metric, per-query mins,
calib_sec, corpus_id, flagship mins + recipe) sized to survive the
driver's ~2,000-char tail capture (r9 verdict item 1: BENCH_r09.json
went parsed:null when the single full line outgrew the window).

Each query executes end-to-end via the `noop` sink — the full physical
plan runs (scan -> shuffle -> agg/join) without driver-side collection,
so the numbers measure the engine, not result transfer.

Protocol (frozen round 5, per the r4 verdict's stabilization ask):

- THREE independent PASSES, each in a FRESH python+JVM process (a
  long-lived local session accumulates listener/broadcast/GC state that
  inflates late queries by 1.4-1.6x on sub-second absolutes — measured
  in rounds 3-4); the recorded number per query is the min across
  passes.
- Within a pass each query runs once UNTIMED (codegen/footer/page-cache
  warm) then once TIMED — the same steady-state semantics the round-2..4
  numbers used, so the series stays comparable.
- "corpus_id" fingerprints the input parquet (name, size, head/tail
  bytes of each file) so a regenerated corpus can never masquerade as a
  regression: compare rounds only at equal corpus_id.
- All three raw pass values are emitted in "runs"; cold-start cost stays
  recoverable.

Host-drift anchoring (added round 8, per the r7 verdict: driver r7 ran
1.29x r6 with a near-uniform shift across queries untouched since r1 —
host-condition drift, not regressions — eroding the 2x bar's meaning):

- "host" records loadavg before/after and a FIXED CPU-bound calibration
  microbenchmark (single-threaded sha256 over a constant buffer, run
  before each pass; min reported). The calibration measures the host,
  never the engine: same work every run, no JVM, no I/O.
- To compare a run against reference values recorded under different
  host conditions, normalize: t_norm = t_raw * (calib_ref / calib_now),
  where calib_ref is the calibration value recorded WITH the reference
  series (BASELINE.md). Raw values stay primary; normalization is the
  documented drift correction, applied explicitly, never silently.

Flagship tier (round 8, r7 verdict item 7): 16 of 18 headline queries
ride sub-1.1 s absolutes at sf0.1 where JVM/session jitter dominates.
``python bench.py --flagship`` runs the 5 most scale-relevant plans at
~sf1 (the standing replica-gate corpus: ``python
tools/make_scale_data.py 10 /tmp/scale_sf1``) so the 2x regression bar
rides >2 s absolutes.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

#: headline set: the flagship DNS pipeline + joins + the scale-relevant
#: training-data ops. (The full inventory runs in the correctness gate;
#: bench tracks the expensive representative plans.)
HEADLINE = [
    "dns_client_query_agg",
    "dns_client_response_agg",
    "dns_response_time_join",
    "dns_match_once",
    "dns_pipeline_e2e",
    "dns_q1_top_addresses",
    "dns_q4_latency_series",
    "tpch_pricing_summary",
    "tpch_top_orders",
    "tpch_region_revenue",
    "events_sessionize",
    "events_asof_attribution",
    "curate_corpus_e2e",
    "tpch_small_qty_revenue",
    "text_fingerprints",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_ivf_topk",
]

#: flagship tier: the expensive representative plans, run at ~sf1 (the
#: standing replica-gate corpus, rebuilt every round) so the absolutes
#: clear the sub-second noise floor. A ~sf0.3 trial still left every
#: query under 1.8 s; the 10x replica is the tier that rides >2 s.
FLAGSHIP = [
    "dns_q4_latency_series",
    "dns_response_time_join",
    "dedup_minhash_lsh",
    "sim_ivf_topk",
    "curate_corpus_e2e",
]
FLAGSHIP_SF_DIR = "/tmp/scale_sf1"
#: replica recipe fingerprint: flagship values are only comparable across
#: rounds at the same recipe (the replica corpus is regenerated per round,
#: so its corpus_id changes while the data-generating recipe does not)
FLAGSHIP_RECIPE = "make_scale_data.py N=10 from /root/testdata/sf0.1"

#: 3 fresh-session passes: two identical back-to-back runs still showed
#: ~20% total drift from host noise at sub-second absolutes; a third
#: pass tightens the min at +~2 min wall
N_PASSES = 3

#: The driver records only the LAST ~2,000 chars of stdout and parses the
#: last JSON line within them (BENCH_r09.json went parsed:null when the
#: flagship block pushed the single output line past that window — r9
#: verdict item 1). The FINAL printed line is therefore a compact summary
#: bounded well under the capture window; the full artifact (runs arrays,
#: host block, protocol) is printed on an EARLIER line and also written to
#: FULL_ARTIFACT_PATH for post-hoc tooling.
MAX_FINAL_LINE = 1500
FULL_ARTIFACT_PATH = os.path.join(HERE, "bench_full.json")


def calibrate() -> float:
    """Fixed CPU-bound host-speed probe: single-threaded sha256 over a
    constant 64 KiB buffer, 20k updates (~1.3 GiB hashed). Same work
    every invocation — the measured seconds track host speed (CPU clock,
    contention, thermal state), never the engine. Used to normalize
    bench values across host-condition drift (module docstring)."""
    buf = b"\x00" * 65536
    h = hashlib.sha256()
    t0 = time.time()
    for _ in range(20_000):
        h.update(buf)
    return round(time.time() - t0, 4)


def corpus_id(sf_dir: str) -> str:
    """Cheap content fingerprint of the input corpus: per parquet file,
    name + size + first/last 64 KiB. Stable across runs on the same
    data, different whenever the driver regenerates the corpus."""
    h = hashlib.sha256()
    for fname in sorted(os.listdir(sf_dir)):
        if not fname.endswith(".parquet"):
            continue
        path = os.path.join(sf_dir, fname)
        if not os.path.isfile(path):  # replica-style parquet DIRECTORY:
            # fingerprint the part-file names+sizes instead of contents
            for part in sorted(os.listdir(path)):
                h.update(
                    f"{fname}/{part}:{os.path.getsize(os.path.join(path, part))}:".encode()
                )
            continue
        size = os.path.getsize(path)
        h.update(f"{fname}:{size}:".encode())
        with open(path, "rb") as f:
            h.update(f.read(65536))
            if size > 65536:
                f.seek(-65536, os.SEEK_END)
                h.update(f.read(65536))
    return h.hexdigest()[:16]


def run_pass(sf_dir: str, names: list[str] | None = None) -> dict[str, float]:
    """One fresh-session pass: per query one untimed warm run, then one
    timed run. Runs inside the --worker subprocess."""
    from dnstap2clickhouse_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("bench")
    queries = entry.queries()

    # one untimed JVM warm-up (codegen/parquet-footer initialization)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in names or HEADLINE:
        for timed in (False, True):
            df = queries[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            if timed:
                timings[name] = round(time.time() - t0, 3)
        # outside the timed region: let ContextCleaner drop finished
        # queries' broadcast blocks so late queries don't pay earlier
        # queries' GC debt (measured 11.3s -> 3.1s on the 18th query of
        # a 30x-corpus session)
        import gc

        gc.collect()
        spark._jvm.System.gc()
    spark.stop()
    return timings


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _collect_passes(sf_dir: str, flagship: bool) -> tuple[dict, list[float]]:
    """N_PASSES fresh-process worker passes over one tier; returns
    ({query: [pass values]}, [calibration per pass])."""
    calibs: list[float] = []
    runs: dict[str, list[float]] = {q: [] for q in (FLAGSHIP if flagship else HEADLINE)}
    for _ in range(N_PASSES):
        calibs.append(calibrate())
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             f"--sf-dir={sf_dir}"]
            + (["--flagship"] if flagship else []),
            capture_output=True,
            text=True,
            env=os.environ,
            cwd=HERE,
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"bench worker failed rc={proc.returncode}")
        for q, t in json.loads(lines[-1])["queries"].items():
            runs[q].append(t)
    return runs, calibs


def _flagship_block() -> dict:
    """Flagship tier as a sub-block of the default bench artifact (r8
    verdict item 3: the per-round driver JSON must carry the >2 s-absolute
    series, not only the jittery sub-second sf0.1 tier). Skips with a
    reason instead of failing when the standing replica corpus is absent."""
    if not os.path.isdir(FLAGSHIP_SF_DIR):
        return {
            "skipped": (
                f"replica corpus missing at {FLAGSHIP_SF_DIR} — build with "
                "`python tools/make_scale_data.py 10 /tmp/scale_sf1`"
            )
        }
    try:
        runs, calibs = _collect_passes(FLAGSHIP_SF_DIR, flagship=True)
    except SystemExit as exc:
        # a flagship worker failure must degrade THIS block, never sink
        # the headline artifact the driver records
        return {"skipped": f"flagship pass failed: {exc}"}
    timings = {q: min(v) for q, v in runs.items()}
    return {
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf_dir": FLAGSHIP_SF_DIR,
        "recipe": FLAGSHIP_RECIPE,
        "corpus_id": corpus_id(FLAGSHIP_SF_DIR),
        "calib_sec": min(calibs),
        "calib_runs": calibs,
    }


def _compact(out: dict) -> dict:
    """Driver-facing summary of a full artifact: metric, per-query MINS,
    calibration, corpus fingerprint, and the flagship tier's mins +
    recipe — everything compare_bench needs to judge a round — with the
    bulky evidence (runs arrays, host block, protocol prose) left to the
    full artifact. Deterministically trimmed if it would ever exceed
    MAX_FINAL_LINE (it does not at the current 18+5 query census)."""
    c = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "sf": out["sf"],
        "corpus_id": out["corpus_id"],
        "calib_sec": out["host"]["calib_sec"],
        "full": os.path.basename(FULL_ARTIFACT_PATH),
    }
    if "recipe" in out:  # standalone --flagship run
        c["recipe"] = out["recipe"]
    fb = out.get("flagship")
    if isinstance(fb, dict):
        if "skipped" in fb:
            c["flagship"] = {"skipped": fb["skipped"][:200]}
        else:
            c["flagship"] = {
                "value": fb["value"],
                "unit": fb["unit"],
                "queries": fb["queries"],
                "recipe": fb["recipe"],
                "corpus_id": fb["corpus_id"],
                "calib_sec": fb["calib_sec"],
            }
    # defensive trim cascade — never emit a final line the driver's tail
    # capture could clip mid-JSON
    for drop in ("full", "flagship", "queries"):
        if len(json.dumps(c)) <= MAX_FINAL_LINE:
            break
        c.pop(drop, None)
    return c


def main() -> None:
    flagship = "--flagship" in sys.argv
    explicit_dir = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--sf-dir=")), None
    )
    default_dir = FLAGSHIP_SF_DIR if flagship else "/root/testdata/sf0.1"
    # --sf-dir (worker plumbing) wins over the env override: the parent
    # resolves the env once, and the flagship sub-run must not inherit
    # the HEADLINE tier's directory from it
    sf_dir = explicit_dir or os.environ.get("SPARK_GRAFT_SF_DIR", default_dir)

    if "--worker" in sys.argv:
        print(json.dumps({"queries": run_pass(sf_dir, FLAGSHIP if flagship else HEADLINE)}))
        return

    load_pre = os.getloadavg()
    runs, calibs = _collect_passes(sf_dir, flagship)
    timings = {q: min(v) for q, v in runs.items()}
    total = round(sum(timings.values()), 3)
    out = {
        "metric": (
            "flagship_total_runtime" if flagship else "headline_total_runtime"
        ),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": _sf_of(sf_dir),
        "corpus_id": corpus_id(sf_dir),
        "host": {
            "calib_sec": min(calibs),
            "calib_runs": calibs,
            "loadavg_pre": [round(x, 2) for x in load_pre],
            "loadavg_post": [round(x, 2) for x in os.getloadavg()],
            "cpus": os.cpu_count(),
        },
        "protocol": (
            f"min over {N_PASSES} fresh-session passes; per pass one "
            "untimed warm run then one timed run per query (noop sink)"
            # tier description derived from the directory actually run
            # (the r8 string hardcoded '~sf0.3', a rejected trial)
            + (f"; flagship tier at ~sf1 (10x replica: {sf_dir})" if flagship else "")
        ),
    }
    if flagship:
        # replica-recipe fingerprint on the standalone artifact too, so
        # compare_bench's --flagship recipe guard never sees None == None
        # as a vacuous match (r9 ADVICE medium)
        out["recipe"] = FLAGSHIP_RECIPE
    else:
        # the default (driver-recorded) artifact carries the flagship
        # tier as a sub-block so per-round regressions are judged on
        # >2 s absolutes (BASELINE.md flagship section)
        out["flagship"] = _flagship_block()
        out["host"]["loadavg_post"] = [round(x, 2) for x in os.getloadavg()]
    # full artifact: an EARLIER stdout line + a file; the driver's tail
    # capture may clip it — the compact FINAL line is what it parses
    try:
        with open(FULL_ARTIFACT_PATH, "w") as f:
            json.dump(out, f, indent=2)
    except OSError:
        pass  # read-only checkout: stdout still carries the full line
    print(json.dumps(out))
    line = json.dumps(_compact(out))
    assert len(line) <= MAX_FINAL_LINE, len(line)
    print(line)


if __name__ == "__main__":
    main()
