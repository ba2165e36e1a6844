"""spacetime_crawler4py_spark — a from-scratch PySpark-native rebuild of the
capabilities of YatongXing/spacetime-crawler4py (reference, read-only at
/root/reference): a distributed URL-frontier + fetch scheduler plus the
offline crawl analytics, re-expressed Spark-first.

Layout
------
functions/   scalar kernels + vectorized Arrow UDFs (URL canonicalization,
             the is_valid URL filter, HTML->span parsing, tokenizers,
             shingle fingerprints, Bloom filter)
sources/     table store (parquet snapshot store with Iceberg-style MERGE
             semantics) and the deterministic synthetic-web generator
plans/       relational building blocks: politeness token-budget dequeue,
             seen-set anti-join merge, seq assignment
operators/   training-data pipeline operators: dedup (exact/minhash/simhash/
             ngram-jaccard/embedding), similarity search, text analysis,
             multimodal plumbing, report analytics
streaming/   the epoch-loop crawl engine (batch fixpoint; the reference's
             continuous pull loop has no event-time/watermark semantics,
             so Structured Streaming is intentionally not used)
oracle/      pure-Python single-threaded reference-semantics crawler used
             as the golden oracle in tests
"""

__version__ = "0.1.0"
