"""Two-parallelism scaling evidence (BASELINE.md protocol).

The north rule's criterion — throughput scaling efficiency >= 0.8 from N to
4N executors — cannot use a real cluster in this sandbox, so we run the SAME
extraction job on the SAME input at local[N] and local[4N] (fresh JVM each,
sequential so the runs never share cores) and report throughput at both plus
efficiency = (docs/sec at 4N) / (4 * docs/sec at N).

Usage: python tools/bench_scaling.py [N] [replicas]
Writes results to BENCH.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def run_once(cpus: int, replicas: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_REPLICAS"] = str(replicas)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--throughput-only"],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    lo = run_once(n, replicas, sf_dir)
    hi = run_once(4 * n, replicas, sf_dir)

    t_lo = lo["extract_docs_per_sec"]
    t_hi = hi["extract_docs_per_sec"]
    eff = t_hi / (4.0 * t_lo)
    summary = {
        "docs": lo["throughput_docs"],
        "sf_dir": sf_dir,
        f"local[{n}]_docs_per_sec": t_lo,
        f"local[{4 * n}]_docs_per_sec": t_hi,
        f"local[{n}]_wall_s": lo["value"],
        f"local[{4 * n}]_wall_s": hi["value"],
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    stamp = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
    md = f"""# BENCH — measured scaling evidence

Protocol: BASELINE.md §"Sandbox measurement protocol". Same extraction job
(synthesize pages -> hot-host salted repartition -> heavy split -> fused
mapInPandas extract -> noop sink), same input ({summary['docs']} docs =
documents.parquet x {replicas} replicas at {sf_dir}), two parallelism
levels, fresh JVM per run, sequential.

| run | cores | wall (s) | docs/sec | docs/sec/core |
|---|---|---|---|---|
| N  | {n} | {lo['value']} | {t_lo} | {lo['extract_docs_per_sec_per_core']} |
| 4N | {4 * n} | {hi['value']} | {t_hi} | {hi['extract_docs_per_sec_per_core']} |

**Scaling efficiency (N -> 4N) = {eff:.3f}** (criterion: >= 0.8 —
{"PASS" if eff >= 0.8 else "FAIL"}).

Measured {stamp}; regenerate with `python tools/bench_scaling.py {n} {replicas}`.
"""
    (REPO / "BENCH.md").write_text(md)


if __name__ == "__main__":
    main()
