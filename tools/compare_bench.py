"""Compare two bench JSONs (bench.py output) with optional host-drift
normalization — the explicit arithmetic behind BASELINE.md's r8
re-anchor rule.

Usage:
    python tools/compare_bench.py REF.json NEW.json [--normalize] [--flagship]

Prints per-query NEW/REF ratios, flags queries above the 2x regression
bar, and — with --normalize — rescales NEW by the calibration ratio
(t_norm = t_raw * calib_ref / calib_new) when both files carry a
calibration value (bench.py records it since r8). Raw ratios are
always printed; the normalized column is additive, never a silent
substitution. Exits 1 if any (normalized, when requested) ratio
crosses 2x.

--flagship (r8 verdict item 3): judge the ~sf1 flagship tier instead of
the headline queries. Each file may be either a standalone
``bench.py --flagship`` output or a default bench artifact carrying the
``flagship`` sub-block (bench.py emits one since r9); the repo ships the
reference minima as BASELINE_flagship.json. The replica corpus is
regenerated per round, so the flagship guard compares the data-generating
``recipe`` instead of corpus_id.

Corpus safety: refuses to compare across different corpus_id (headline)
or recipe (flagship) unless --force.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    """One bench JSON document. Accepts a plain single-document file, a
    driver-recorded BENCH_r*.json, or a redirected ``bench.py > f`` log
    (since r10 bench prints the full artifact on an earlier line and the
    compact summary last — take the LAST parseable JSON line)."""
    text = open(path).read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        for line in reversed(text.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
        raise


def _block(doc: dict, flagship: bool) -> dict | None:
    """The comparable unit of one file: the flagship sub-block (or the
    file itself if it IS a flagship run) when --flagship, else the file.
    Driver-recorded BENCH_r*.json files wrap the bench line under a
    'parsed' key — unwrap so they compare directly."""
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]
    if not flagship:
        return doc
    if doc.get("metric") == "flagship_total_runtime":
        return doc
    blk = doc.get("flagship")
    if not isinstance(blk, dict) or "queries" not in blk:
        return None
    return blk


def _calib(block: dict) -> float | None:
    # explicit presence checks, not truthiness: a recorded 0.0 must be
    # rejected as INVALID later, never silently fall through to host
    # (r9 ADVICE low)
    if block.get("calib_sec") is not None:
        return block["calib_sec"]
    host = block.get("host") or {}
    if host.get("calib_sec") is not None:
        return host["calib_sec"]
    return None


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    normalize = "--normalize" in sys.argv
    force = "--force" in sys.argv
    flagship = "--flagship" in sys.argv
    if len(args) != 2:
        print(__doc__)
        return 2
    ref = _block(_load(args[0]), flagship)
    new = _block(_load(args[1]), flagship)
    if ref is None or new is None:
        which = args[0] if ref is None else args[1]
        print(f"no flagship block with queries in {which} (skipped or absent)")
        return 2
    if "queries" not in ref or "queries" not in new:
        # e.g. a driver wrapper whose 'parsed' is null (the clipped-line
        # failure bench now prevents) — refuse with a message, even
        # under --force, instead of a KeyError
        which = args[0] if "queries" not in ref else args[1]
        print(f"no per-query data in {which} (parsed:null driver artifact?)")
        return 2

    if flagship:
        if (ref.get("recipe") is None or new.get("recipe") is None) and not force:
            # a missing recipe must REFUSE, not vacuously match another
            # missing recipe (r9 ADVICE medium)
            which = args[0] if ref.get("recipe") is None else args[1]
            print(
                f"recipe missing in {which} — flagship times are only"
                " comparable at a recorded replica recipe (pass --force"
                " to compare anyway)"
            )
            return 2
        if ref.get("recipe") != new.get("recipe") and not force:
            print(
                f"recipe mismatch: {ref.get('recipe')!r} vs {new.get('recipe')!r}"
                " — flagship times are only comparable at equal replica recipe"
                " (pass --force to compare anyway)"
            )
            return 2
    elif ref.get("corpus_id") != new.get("corpus_id") and not force:
        print(
            f"corpus mismatch: {ref.get('corpus_id')} vs {new.get('corpus_id')}"
            " — per-query times are only comparable at equal corpus_id"
            " (pass --force to compare anyway)"
        )
        return 2

    calib_ref, calib_new = _calib(ref), _calib(new)
    scale = 1.0
    if normalize:
        if calib_ref is None or calib_new is None:
            print("--normalize needs a calibration value in BOTH files")
            return 2
        if not calib_ref or not calib_new:
            print(f"invalid calibration value (ref {calib_ref}, new {calib_new})")
            return 2
        scale = calib_ref / calib_new

    shared = [q for q in ref["queries"] if q in new["queries"]]
    missing = sorted(set(ref["queries"]) ^ set(new["queries"]))
    if missing:
        print(f"note: {len(missing)} queries not in both files: {missing}")

    hdr = f"{'query':30s} {'ref':>7s} {'new':>7s} {'ratio':>6s}"
    if normalize:
        hdr += f" {'norm':>6s}"
    print(hdr)
    breaches = []
    for q in shared:
        a, b = ref["queries"][q], new["queries"][q]
        ratio = b / a
        line = f"{q:30s} {a:7.3f} {b:7.3f} {ratio:6.2f}"
        judged = ratio
        if normalize:
            judged = b * scale / a
            line += f" {judged:6.2f}"
        if judged > 2.0:
            breaches.append(q)
            line += "  << 2x BREACH"
        print(line)
    tr, tn = sum(ref["queries"][q] for q in shared), sum(
        new["queries"][q] for q in shared
    )
    print(f"\ntotal: ref {tr:.3f}s new {tn:.3f}s ratio {tn / tr:.2f}", end="")
    if normalize:
        print(f" normalized {tn * scale / tr:.2f} (calib {calib_ref}/{calib_new})")
    else:
        print()
    if breaches:
        print("2x breaches:", breaches)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
