"""Edge-case regressions: short/empty documents through the shingle ops.

ADVICE r01 (medium): F.sequence(1, n-2) is DESCENDING when a doc has <3
whitespace tokens (Spark defaults step to -1), and element_at(toks, 0)
then throws "SQL array indices start at 1" — crashing every shingle-based
op on any short document.  These tests pin the guarded behavior: short
docs contribute an empty shingle/bigram set (matching DuckDB's
range(1, len-1) semantics) and the ops run end-to-end.
"""

import os

import pytest
from pyspark.sql import Row

from carpet_spark.ops import llm  # noqa: F401  (registration side-effects)
from carpet_spark.registry import REGISTRY


@pytest.fixture(scope="module")
def short_doc_dir(spark, tmp_path_factory):
    """A documents table containing 0-, 1-, 2-, and 3-token docs plus a
    true near-dup pair, written as parquet in the driver's layout."""
    base = str(tmp_path_factory.mktemp("short_docs"))
    rows = [
        Row(doc_id=0, text="", lang="en", source="web", n_chars=0),
        Row(doc_id=1, text="one", lang="en", source="web", n_chars=3),
        Row(doc_id=2, text="two tokens", lang="en", source="web", n_chars=10),
        Row(doc_id=3, text="exactly three tokens", lang="en", source="web", n_chars=20),
        Row(
            doc_id=4,
            text="the quick brown fox jumps over the lazy dog today",
            lang="en",
            source="web",
            n_chars=49,
        ),
        Row(
            doc_id=5,
            text="the quick brown fox jumps over the lazy dog tomorrow",
            lang="en",
            source="web",
            n_chars=52,
        ),
    ]
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "documents.parquet")
    )
    return base


@pytest.mark.parametrize(
    "op_name",
    ["dedup_near_jaccard", "dedup_near_minhash", "dedup_near_simhash", "dedup_clusters"],
)
def test_shingle_ops_survive_short_docs(spark, short_doc_dir, op_name):
    rows = REGISTRY[op_name].fn(spark, short_doc_dir).collect()
    # The only near-dup pair is (4, 5): 8/10 shared 3-shingles = 0.8 >= 0.7.
    if op_name in ("dedup_near_jaccard", "dedup_near_minhash"):
        pairs = {(r.doc_a, r.doc_b) for r in rows}
        assert (4, 5) in pairs
        assert all(a >= 4 for a, _ in pairs), "short docs must not pair"


def test_text_ngrams_survives_short_docs(spark, short_doc_dir):
    rows = REGISTRY["text_ngrams"].fn(spark, short_doc_dir).collect()
    bigrams = {r.bigram: r.cnt for r in rows}
    # 1-token and empty docs contribute nothing; 2-token doc contributes one.
    assert bigrams.get("two tokens") == 1
    assert "one" not in bigrams and "" not in bigrams


def test_shingle_guard_matches_duckdb_empty_semantics(spark, short_doc_dir):
    """dedup_near_jaccard's oracle (range(1, len-1)) yields empty shingles
    for short docs — the Spark side must agree, i.e. produce zero pairs
    among doc_ids 0-3."""
    rows = REGISTRY["dedup_near_jaccard"].fn(spark, short_doc_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == {(4, 5)}
