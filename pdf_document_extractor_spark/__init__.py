"""spark-webtext-extract: a PySpark-native main-content extraction engine.

A brand-new engine (NOT a port) with the per-document extraction semantics of
MarkEnverus/pdf-document-extractor (see /root/reference), re-expressed
Spark-first:

- ``core``      pure-Python extraction core (zero Spark imports) — the same
                functions serve as the pandas-UDF body on executors and as
                the pytest oracle, so byte-identity of extracted text holds
                by construction.
- ``fixtures``  deterministic seeded corpus generator (synthetic PDFs/HTML).
- ``operators`` Spark DataFrame operators: mapInPandas extraction, dedup
                family (exact / minhash-LSH / simhash / ngram-jaccard /
                embedding), similarity search, text analysis, skew salting.
- ``sources``   pages-table readers/synthesis + snapshot-commit catalog
                (Iceberg when available, atomic parquet snapshots otherwise).
- ``plans``     the end-to-end job: resume anti-join -> skew pre-pass ->
                salted repartition -> light/heavy split -> extract ->
                lineage merge.
- ``streaming`` Structured Streaming variant of the extraction pass.
"""

__version__ = "0.1.0"
