"""multi_format_document_extractor_spark — a brand-new PySpark-native
multi-format main-content extraction engine.

Reproduces the capabilities of akshaykaradkar/multi-format-document-extractor
(format detection, per-format parsing, normalization, confidence scoring,
validation, hybrid routing, ensemble fusion, uncertainty sampling, batch
metrics) as an idiomatic Spark DataFrame pipeline over Common-Crawl-style
web-page tables ``(url, warc_ts, html BINARY, text, lang)``.

Design stance (SURVEY.md §7): exactly one expensive Arrow/pandas UDF stage
(the per-format parser, with per-partition parser pools); everything else is
native Spark SQL columns so Catalyst can prune, push down, and codegen.
"""

__version__ = "0.1.0"
