#!/usr/bin/env python
"""ANN scale probe (r02 VERDICT item 7): measure the banded-SRP pair-dedup
and batch k-NN join shapes one more decade up, on the SAME code paths the
registered ops use (ann.semantic_pair_dedup / ann.knn_join_topk).

Why not the registered constants: the ops ship demo banding (8 bands x 2
bits, threshold 0.4) tuned for the 2k-vector fixture's recall property
test; at that setting ~90% of ALL pairs collide in some band, so scaling it
up just measures an all-pairs join.  Production LSH sizes the signature
width with the corpus: expected random collisions = n^2/2 * bands/2^bits,
so holding collisions-per-doc constant needs bits ~ log2(bands*n/alpha) —
the standard sizing rule.  The probe applies it (alpha = 8 candidates/doc)
and reports measured recall of planted near-dup pairs alongside wall time,
so the recall cost of the wider bands is visible too.

Synthetic data (seeded): standard-normal 64-dim vectors; 5% are
perturbations of an earlier base vector at cos ~ 0.95 (sigma = 0.33);
1% of rows are the k-NN query side (label = 1).  Threshold 0.9.

Results land in SCALE.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from carpet_spark.ops.ann import (
    _DIM,
    _SEED,
    knn_join_topk,
    semantic_pair_dedup,
)
from carpet_spark.session import get_spark

BASE = "/tmp/carpet_scale/ann"
BANDS = 16
ALPHA = 8  # target expected random candidates per doc
THRESHOLD = 0.9
DUP_FRAC = 0.05
SIGMA = 0.33  # cos ~ 1/sqrt(1+sigma^2) ~ 0.95


def bits_for(n: int) -> int:
    return max(8, math.ceil(math.log2(BANDS * n / ALPHA)))


def synth(n: int) -> tuple[str, np.ndarray, list[tuple[int, int]]]:
    """Write {BASE}/x{n}/embeddings.parquet; return (dir, vectors, planted)."""
    d = f"{BASE}/x{n}"
    rng = np.random.default_rng(_SEED + n)
    vecs = rng.standard_normal((n, _DIM))
    planted: list[tuple[int, int]] = []
    n_dup = int(n * DUP_FRAC)
    # rows n-n_dup..n-1 are perturbed copies of uniformly-drawn earlier rows
    bases = rng.integers(0, n - n_dup, size=n_dup)
    for i, b in enumerate(bases):
        row = n - n_dup + i
        vecs[row] = vecs[b] + SIGMA * rng.standard_normal(_DIM)
        planted.append((int(b), row))
    if not os.path.exists(d):
        os.makedirs(d, exist_ok=True)
        labels = (np.arange(n) % 100 == 0).astype("int32")  # 1% query side
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    [v.astype("float32") for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        )
        pq.write_table(tbl, f"{d}/embeddings.parquet")
    return d, vecs, planted


def true_pairs(vecs: np.ndarray, planted: list[tuple[int, int]]) -> set[tuple[int, int]]:
    """Planted pairs whose ACTUAL cosine clears the threshold (noise can
    push a perturbed copy below it)."""
    out = set()
    for a, b in planted:
        c = float(vecs[a] @ vecs[b] / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
        if round(c, 6) >= THRESHOLD:
            out.add((min(a, b), max(a, b)))
    return out


def main() -> None:
    spark = get_spark("ann_scale_probe", cpus=32)
    for n in (2_000, 20_000, 200_000):
        bits = bits_for(n)
        planes = np.random.default_rng(_SEED + 1).standard_normal((BANDS * bits, _DIM))
        d, vecs, planted = synth(n)
        e = spark.read.parquet(f"{d}/embeddings.parquet")
        j = e.select(e.vec_id.alias("doc_id"), "embedding")

        truth = true_pairs(vecs, planted)
        best, pairs = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = semantic_pair_dedup(j, planes, BANDS, bits, THRESHOLD).collect()
            best = min(best, time.perf_counter() - t0)
            pairs = {(min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)) for r in rows}
        recall = len(pairs & truth) / len(truth) if truth else 1.0

        kbest = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            kn = knn_join_topk(e, planes, BANDS, bits, 3).count()
            kbest = min(kbest, time.perf_counter() - t0)

        print(
            f"n={n} bits={bits} dedup={best:.2f}s pairs={len(pairs)} "
            f"truth={len(truth)} recall={recall:.3f} knn={kbest:.2f}s knn_rows={kn}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
