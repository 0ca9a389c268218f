#!/usr/bin/env python
"""Parallel full-suite gate (r06 VERDICT item 4): run pytest in N sharded
subprocesses so the whole suite finishes in wall-clock/N instead of the
~52-minute single-process run the regimes have grown into.

pytest-xdist is not installed in this container (and pip installs are
off-limits), so sharding is done by the deterministic CARPET_SHARD=i/N
filter in tests/conftest.py: every worker collects the identical item
list and keeps its round-robin slice — the N shards partition the suite
exactly (same total test count, zero overlap, verified by summing the
per-worker pass counts).

Each worker is its own process with its own SparkSession JVM and DuckDB
connection; the 32 host cores are split across workers via
SPARK_GRAFT_CPUS so the JVMs don't oversubscribe.  Fixture builders under
/tmp publish atomically (os.replace), so concurrent workers building the
same degenerate fixture are safe by construction.

Usage: python scripts/run_tests_sharded.py [N] [pytest args...]
       (default N=4; extra args pass through to every worker)
Exits nonzero if any worker fails; prints the aggregated counts.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    argv = sys.argv[1:]
    n = 4
    if argv and argv[0].isdigit():
        n = int(argv[0])
        argv = argv[1:]
    extra = argv or ["tests/"]
    cpus = os.cpu_count() or 8
    per_worker = max(2, cpus // n)

    procs = []
    t0 = time.time()
    for i in range(n):
        env = dict(os.environ)
        env["CARPET_SHARD"] = f"{i}/{n}"
        env.setdefault("SPARK_GRAFT_CPUS", str(per_worker))
        log = f"/tmp/carpet_shard_{i}_of_{n}.log"
        f = open(log, "w")
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             *extra],
            cwd=REPO, env=env, stdout=f, stderr=subprocess.STDOUT,
        )
        procs.append((i, p, log, f))
        print(f"shard {i}/{n} -> pid {p.pid}  log {log}", flush=True)

    total_pass = total_fail = 0
    rc = 0
    for i, p, log, f in procs:
        code = p.wait()
        f.close()
        tail = open(log).read()
        m = re.search(r"(\d+) passed", tail)
        npass = int(m.group(1)) if m else 0
        mf = re.search(r"(\d+) failed", tail)
        nfail = int(mf.group(1)) if mf else 0
        me = re.search(r"(\d+) error", tail)
        nerr = int(me.group(1)) if me else 0
        total_pass += npass
        total_fail += nfail + nerr
        status = "OK" if code in (0, 5) and nfail + nerr == 0 else "FAIL"
        if status == "FAIL":
            rc = 1
        print(f"shard {i}/{n}: exit {code}  {npass} passed "
              f"{nfail} failed {nerr} errors  [{status}]", flush=True)

    dt = time.time() - t0
    print(f"TOTAL: {total_pass} passed, {total_fail} failed/errored "
          f"across {n} shards in {dt / 60:.1f} min")
    return rc


if __name__ == "__main__":
    sys.exit(main())
