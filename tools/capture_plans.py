"""Capture ``explain('formatted')`` for the bench queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [sf_dir] [query ...]

Writes ``plans/<tag>/<query>_<suffix>.txt`` where suffix is the last
``_``-separated piece of the tag (e.g. tag ``r10_before`` ->
``<query>_before.txt``). Default query set: the bench HEADLINE list.
The session mirrors the bench (session.get_spark), so the captured
initial AQE plans are the ones the bench actually executes.
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from dnstap2clickhouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r10_before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import bench
    import __spark_entry__ as entry

    names = sys.argv[3:] or bench.HEADLINE
    parts = tag.split("_")
    out_dir = os.path.join(HERE, "plans", parts[0])
    suffix = parts[-1] if len(parts) > 1 else "plan"
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture_plans")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
