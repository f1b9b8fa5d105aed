"""code_graph_rag_ray — a Ray-Data-native knowledge-graph construction engine.

Re-imagines the file→entities/relations graph builder of
``vitali87/code-graph-rag`` (surveyed in SURVEY.md with file:line citations)
for Common-Crawl-style web-page Parquet tables
``(url, warc_ts, html, text, lang)``:

- deterministic HTML→text extraction (byte-identical per url; analog of the
  reference's deterministic tree-sitter parse, graph_updater.py:1831),
- pattern triple extraction + entity-mention detection
  (analog of parsers/function_ingest.py / import_processor.py per-file
  ingestion),
- broadcast alias-dictionary entity linking in an actor pool
  (analog of FunctionRegistryTrie + call_resolver.py cascade),
- skew-aware groupby + iterative connected-components canonicalization
  (analog of graph_service.py MERGE dedup + C# partial-group identity),
- sort-materialized (subj, pred, obj) edge tables partitioned by subject
  hash with per-partition lineage for resume.

Everything is ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches; actor pools host stateful stages; wide steps are
explicit groupby/shuffle with documented keys (SURVEY.md §7).

No module in this package calls ``ray.init()`` — sessions are owned by the
driver, ``bench.py`` and the test fixture only.
"""

__version__ = "0.1.0"
