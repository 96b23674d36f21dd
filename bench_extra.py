#!/usr/bin/env python
"""Round-6 optimization helper bench (bench.py is FROZEN — this file is
the §1.4 noop-sink isolation harness the round works from).

Usage:
  python bench_extra.py [--sf DIR] [--repeat N] [query ...]
  python bench_extra.py --explain-dir plans/r06 --suffix _before [query ...]

Per query: time df.write.format('noop') (same methodology as bench.py's
query loop), labelled via setJobDescription; optionally dump
.explain('formatted') to <explain-dir>/<query><suffix>.txt without
executing. Prints one JSON line with the per-query seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain-dir", default=None,
                    help="dump explain('formatted') here instead of timing")
    ap.add_argument("--suffix", default="",
                    help="filename suffix for --explain-dir (e.g. _before)")
    ap.add_argument("--also-time", action="store_true",
                    help="with --explain-dir: time the queries too")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench_extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry

    registry = entry.queries()
    names = args.queries or list(registry)
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = registry[name](spark, args.sf)
            text = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(text)
        print(f"wrote {len(names)} plans to {args.explain_dir}")
        if not args.also_time:
            spark.stop()
            return

    out: dict[str, list[float]] = {}
    for _ in range(args.repeat):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            registry[name](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            out.setdefault(name, []).append(
                round(time.perf_counter() - t0, 3)
            )
            spark.sparkContext.setJobDescription(None)
    best = {k: min(v) for k, v in out.items()}
    print(json.dumps({"sf": args.sf, "cpus": cpus,
                      "queries_min": best, "samples": out}))
    spark.stop()


if __name__ == "__main__":
    main()
