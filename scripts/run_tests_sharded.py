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
        env["CARPET_DURATIONS_OUT"] = f"/tmp/carpet_durations_{i}_of_{n}.json"
        log = f"/tmp/carpet_shard_{i}_of_{n}.log"
        f = open(log, "w")
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             *extra],
            cwd=REPO, env=env, stdout=f, stderr=subprocess.STDOUT,
        )
        procs.append((i, p, log, f))
        print(f"shard {i}/{n} -> pid {p.pid}  log {log}", flush=True)

    total_pass = total_fail = total_skip = 0
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
        ms = re.search(r"(\d+) skipped", tail)
        nskip = int(ms.group(1)) if ms else 0
        # xfailed/xpassed count toward the collection reconciliation too
        mx = re.search(r"(\d+) xfailed", tail)
        mp = re.search(r"(\d+) xpassed", tail)
        nskip += (int(mx.group(1)) if mx else 0) + (int(mp.group(1)) if mp else 0)
        total_pass += npass
        total_fail += nfail + nerr
        total_skip += nskip
        # exit 5 = "no tests collected" and npass == 0 both mean the shard
        # ran NOTHING — a mis-sharded worker must fail the gate, not pass
        # it silently (r7 ADVICE).
        status = "OK" if code == 0 and nfail + nerr == 0 and npass > 0 else "FAIL"
        if status == "FAIL":
            rc = 1
        print(f"shard {i}/{n}: exit {code}  {npass} passed "
              f"{nfail} failed {nerr} errors {nskip} skipped  [{status}]",
              flush=True)

    dt = time.time() - t0
    print(f"TOTAL: {total_pass} passed, {total_fail} failed/errored, "
          f"{total_skip} skipped across {n} shards in {dt / 60:.1f} min")

    # Reconciliation: the union of the shards must equal one unsharded
    # collection — catches double-counted or silently-dropped tests.
    col = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q",
         "-p", "no:cacheprovider", *extra],
        cwd=REPO, capture_output=True, text=True,
    )
    mc = re.search(r"(\d+) tests? collected", col.stdout)
    if mc:
        n_collected = int(mc.group(1))
        n_ran = total_pass + total_fail + total_skip
        if total_fail > 0:
            # pytest reports a test that fails in call AND errors in
            # teardown as both "1 failed" and "1 error", so on a red run
            # n_ran can legitimately exceed the collection count — a
            # strict compare would misdiagnose the failure as a sharding
            # bug.  The gate is already failing (rc=1 above); reconcile
            # strictly only when every shard is green.
            print(f"reconciliation skipped on red run: {n_ran} counted vs "
                  f"{n_collected} collected (fail/error overlap possible)",
                  flush=True)
        elif n_ran != n_collected:
            print(f"SHARD MISMATCH: shards ran {n_ran} tests but an "
                  f"unsharded collection finds {n_collected}", flush=True)
            rc = 1
        else:
            print(f"reconciled: {n_ran} == {n_collected} collected", flush=True)
    else:
        print("WARNING: could not parse unsharded collection count", flush=True)
        rc = rc or 1

    # Merge the per-shard duration recordings into the balanced-sharding
    # input for the NEXT run (r07 VERDICT item 3).  Only on a green gate:
    # a failed run under-records its crashed shard and would skew the
    # balance.
    #
    # r10: per-test MIN-of-runs instead of last-write-wins.  The r9/r10
    # contended runs inflated hot tests up to 2.6x (dedup_apply extreme:
    # 157 s recorded vs 60 s idle-solo) and last-write-wins let that
    # poison the LPT balance until someone remembered to `git checkout`
    # the file.  The minimum observed duration is the noise-robust
    # estimator: contention and late-suite JVM degradation only ever
    # ADD time, and the balance needs relative magnitudes, not absolute
    # truth — a stale low entry for a test that genuinely got slower
    # merely schedules it early, which LPT absorbs across ~1000 tests
    # per shard.  Renamed/deleted tests are pruned on full default runs
    # (never on filtered runs, whose collection is a subset by design).
    if rc == 0:
        import json
        old = {}
        dur_file = os.path.join(REPO, "scripts", "test_durations.json")
        try:
            with open(dur_file) as f:
                old = json.load(f)
        except (OSError, ValueError):
            old = {}
        new_run: dict[str, float] = {}
        n_loaded = 0
        for i in range(n):
            try:
                with open(f"/tmp/carpet_durations_{i}_of_{n}.json") as f:
                    new_run.update(json.load(f))
                n_loaded += 1
            except (OSError, ValueError):
                continue
        if new_run:
            # r10 ADVICE: pruning (base = new_run) is only sound when every
            # shard's recording actually loaded — a missing /tmp file on a
            # green full run would silently drop that shard's tests from
            # the balance as if they were renamed.  Fall back to the
            # merge-with-old path (no pruning) when any shard is missing.
            full_run = extra == ["tests/"] and n_loaded == n
            if extra == ["tests/"] and n_loaded < n:
                print(f"WARNING: only {n_loaded}/{n} shard duration files "
                      "loaded on a full run; skipping stale-prune, merging "
                      "with prior durations instead", flush=True)
            base = new_run if full_run else {**old, **new_run}
            merged = {
                k: min(old[k], v) if k in old else v for k, v in base.items()
            }
            n_pruned = len(old) - sum(1 for k in old if k in merged)
            tmp = f"{dur_file}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(merged, f, sort_keys=True)
            os.replace(tmp, dur_file)
            print(f"recorded {len(new_run)} test durations -> {dur_file} "
                  f"({len(merged)} total, min-of-runs merge"
                  f"{f', {n_pruned} stale pruned' if n_pruned else ''}); "
                  f"next run shards duration-balanced", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
