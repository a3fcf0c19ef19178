"""text_search_spark — a PySpark-native full-text index + BM25 query engine.

A brand-new engine with the query/data-processing capabilities of
k2-fsa/text_search (reference at /root/reference, snapshot 2024-10-08),
re-architected Spark-first: the reference's in-memory suffix-array kernels
(`textsearch/csrc/suffix_array.cc`) become a distributed, term-partitioned
positional inverted index; its match-count document vote
(`textsearch/python/textsearch/match.py:453-478`) becomes BM25 top-k with a
deterministic tie-break; its candidate-then-exact two-phase retrieval
(`find_close_matches` -> levenshtein) is preserved as index-lookup ->
grouped-UDF exact rescoring.

Layout:
  textnorm    — canonical extractor/tokenizer kernels (pure Python; mirrored
                as Spark Column expressions and DuckDB SQL for oracles)
  corpus      — deterministic synthetic Common-Crawl-style pages + query set
  oracle      — NumPy BM25 oracle (the trusted yardstick, SURVEY.md §5)
  kernels     — reference-parity kernels (suffix array, close matches, LIS,
                Levenshtein-with-alignment, row splits, interval overlap)
  codec       — delta-gap + varbyte posting codec with block-max metadata
  index/      — distributed index build (salting, segments, merge, resume)
                and the BM25 query engine (AND/OR/phrase, block-max pruning)
  operators/  — top-k, dedup (exact/minhash/simhash/jaccard/embedding),
                ANN similarity search, text analysis, alignment, multimodal
  functions/  — reusable Spark Column expression builders
  streaming/  — Structured Streaming incremental indexing
"""

__version__ = "0.1.0"
