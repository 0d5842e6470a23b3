"""bella_domify_spark — a PySpark-native transcript main-content extraction engine.

A from-scratch reimplementation of the extraction semantics of
LianjiaTech/bella-domify (studied read-only at /root/reference) over Spark
DataFrames of multi-turn conversation transcripts
``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``.

Architecture (Spark-first, not a port):

- ``core``      — the document-tree model (Node/DomTree) and lightweight
                  Line/TextBlock/TableBlock value objects used *inside* Arrow UDFs.
- ``parsers``   — per-format parsers (plain text, Markdown block tokenizer,
                  DOCX-like WordprocessingML walk, CSV, PDF-like glyph-document
                  layout engine) each mapping one turn payload → DomTree → text.
- ``engine``    — the distributed plan: scan → filter → salted repartition →
                  Arrow-batched parse UDF → stable (conv_id, turn_idx) ordering →
                  sink + per-partition checkpoint manifests.
- ``ops``       — large-scale training-data operators over document/embedding
                  tables (dedup families, ANN similarity, text statistics,
                  multimodal column plumbing).

All heavy per-record work happens in vectorized pandas/Arrow UDF bodies
(batches of turns per Python invocation); everything cross-record is plain
DataFrame algebra so Catalyst plans scans, pushdowns and shuffles.
"""

__version__ = "0.1.0"
