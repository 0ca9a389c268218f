#!/usr/bin/env python
"""Dump a normalized physical-plan fingerprint for EVERY registered op to
PLANS.json — the registry-wide extension of bench.py's per-query
fingerprints (r02 VERDICT item 5 institutionalized).

Round-over-round, `diff PLANS.json` answers "which plans changed" across
the whole surface, not just the 9 headline queries: an unchanged
fingerprint with a moved timing is machine drift; a changed one is a plan
change to explain in the commit that moved it.

Ops whose builders EXECUTE work eagerly (sink roundtrips, iterative
graph/ANN training) still fingerprint their final returned plan; builders
that fail (e.g. env-gated) record "ERROR:<type>".

r03 upgrade: pins the ORDER-INSENSITIVE v2 fingerprint
(bench._plan_fingerprint_v2).  The legacy fingerprint flips when Spark's
RewriteDistinctAggregates emits grouping lists in exprId-hash order
(session-allocation dependent — observed on profile_table); v2 sorts
bracket segments so only real shape changes move it.  One-time full
rebaseline: every value changed at the v2 switch, by construction.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _plan_fingerprint_v2
from carpet_spark.registry import REGISTRY
from carpet_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("plan_fingerprints", cpus=8)
    out = {}
    for name in sorted(REGISTRY):
        try:
            # earlier eager ops can leave cached relations (localCheckpoint /
            # cacheTable) that swap later FileScans for InMemoryTableScans —
            # a cache-state plan change, not a shape change.  Fingerprint
            # every op against a cache-clean session so the regen is
            # order-independent and reproducible.
            spark.catalog.clearCache()
            out[name] = _plan_fingerprint_v2(REGISTRY[name].fn(spark, SF))
        except Exception as e:  # env-gated or eager-failure: record, move on
            out[name] = f"ERROR:{type(e).__name__}"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    n_err = sum(1 for v in out.values() if v.startswith("ERROR"))
    print(f"PLANS.json: {len(out)} ops fingerprinted, {n_err} errors")
    spark.stop()


if __name__ == "__main__":
    main()
