"""Large-scale training-data operators (beyond the reference's surface).

Per BASELINE.json's north star these are first-class: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search (brute-force + IVF), text analysis (language-ID,
quality, tokens, fingerprints), multimodal binary-column plumbing.

Design rules:
- JVM-side built-ins only in the hot path (whole-stage codegen); the
  only Python-at-runtime code is the multimodal decode stub, which is
  I/O-bound anyway.
- every deterministic operator exposes BOTH the Spark expression and a
  DuckDB-equivalent SQL string generated from the same constants, so
  the oracle gate compares identical semantics (md5 is the shared
  deterministic hash; double arithmetic is kept in identical order).
- pair-generating operators (near-dup) always block first (LSH bands,
  metadata blocks) — never an unblocked O(n²) self-join — so the same
  plan survives 100 TB.
"""
