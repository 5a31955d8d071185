"""rayfts — a Ray-Data-native full-text indexing + BM25 search engine.

From-scratch re-expression of the capabilities of
``ncolomer/elasticsearch-osmosis-plugin`` (reference at /root/reference,
see SURVEY.md): the plugin's streaming ingest dataflow becomes a
``ray.data.Dataset`` pipeline, and the Elasticsearch/Lucene side it
delegates to (analyzer, inverted index, BM25 top-k, doc-by-id get,
index lifecycle) is built here as first-class Ray Data operators.

Layout:
  analysis   - tokenizer/analyzer (ES ``standard``-analyzer-like; ref
               plugin.properties:10-11)                       [SURVEY M9]
  codec      - delta+varint posting compression, block max-impact
               metadata                                       [SURVEY T3]
  build      - index build pipeline: docID assignment, docstore,
               postings merge, stats, manifest                 [SURVEY §3.1]
  search     - Searcher: get / count / BM25 top-k (TAAT + block-max
               WAND)                                           [SURVEY §3.3]
  config     - job config dataclass (ref Parameters.java)      [SURVEY S4]
  fixtures   - deterministic seeded transcript corpus (FIXTURES.md)
  oracle     - brute-force pure-Python BM25 oracle             [SURVEY §5]
  manifest   - per-partition checkpoint manifest, atomic publish
  hooks      - post-build IndexBuilder extension surface       [SURVEY X1]
  segments   - segmented multi-node builds + MultiSearcher root (SCALE.md)
  compact    - segment compaction / tombstone purge (forceMerge analog)
  extras/    - training-data-pipeline operators: dedup, similarity
               search, text stats, multimodal plumbing
"""

__version__ = "0.1.0"
