"""Count-min sketch properties: never-underestimate, exactness at
collision-free width, partitioning invariance (mergeability)."""

from __future__ import annotations

from collections import Counter

from pdf_document_extractor_spark.operators.sketch import (
    cms_estimate,
    cms_ngram_sketch,
)

ROWS = [
    (1, "a b a b c d"),
    (2, "a b x y z w"),
    (3, "q r s t u v"),
    (4, "a b a b a b"),
]


def _true_counts():
    c = Counter()
    for _id, text in ROWS:
        toks = text.split()
        c.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    return c


def test_cms_never_underestimates_and_exact_when_wide(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    truth = _true_counts()
    # adversarially narrow: collisions guaranteed, estimates only ever >=
    narrow = cms_ngram_sketch(docs, n=2, width=8, depth=2)
    for term, true_c in truth.items():
        assert cms_estimate(narrow, term) >= true_c, term
    # collision-free width: estimates are exact
    wide = cms_ngram_sketch(docs, n=2, width=1 << 14, depth=4)
    for term, true_c in truth.items():
        assert cms_estimate(wide, term) == true_c, term
    assert cms_estimate(wide, "never seen") == 0


def test_cms_is_partitioning_invariant(spark):
    """Mergeability: the sketch must not depend on how rows are split
    across partitions (the property that makes it shuffle-free)."""
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    a = cms_ngram_sketch(docs.repartition(1), width=1 << 10)
    b = cms_ngram_sketch(docs.repartition(7), width=1 << 10)
    assert (a == b).all()
