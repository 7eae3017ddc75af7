"""Compare two bench JSONs (bench.py output) with optional host-drift
normalization — the explicit arithmetic behind BASELINE.md's r8
re-anchor rule.

Usage:
    python tools/compare_bench.py REF.json NEW.json [--normalize]

Prints per-query NEW/REF ratios, flags queries above the 2x regression
bar, and — with --normalize — rescales NEW by the calibration ratio
(t_norm = t_raw * calib_ref / calib_new) when both files carry a
``host.calib_sec`` block (bench.py records it since r8). Raw ratios are
always printed; the normalized column is additive, never a silent
substitution. Exits 1 if any (normalized, when requested) ratio
crosses 2x.

Corpus safety: refuses to compare across different corpus_id unless
--force (per-query times are only comparable at equal corpus).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    normalize = "--normalize" in sys.argv
    force = "--force" in sys.argv
    if len(args) != 2:
        print(__doc__)
        return 2
    ref = json.load(open(args[0]))
    new = json.load(open(args[1]))

    if ref.get("corpus_id") != new.get("corpus_id") and not force:
        print(
            f"corpus mismatch: {ref.get('corpus_id')} vs {new.get('corpus_id')}"
            " — per-query times are only comparable at equal corpus_id"
            " (pass --force to compare anyway)"
        )
        return 2

    calib_ref = (ref.get("host") or {}).get("calib_sec")
    calib_new = (new.get("host") or {}).get("calib_sec")
    scale = 1.0
    if normalize:
        if not (calib_ref and calib_new):
            print("--normalize needs host.calib_sec in BOTH files")
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
