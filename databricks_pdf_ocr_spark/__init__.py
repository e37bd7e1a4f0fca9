"""databricks_pdf_ocr_spark — a from-scratch PySpark-native document-extraction engine.

Re-expresses the capabilities of the reference pipeline
(zaxier/databricks-pdf-ocr, surveyed in SURVEY.md) as idiomatic Spark:

- input: tables of interleaved text + media documents
  ``(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)``
- extraction: HTML boilerplate strip, pure-Python PDF byte-stream
  tokenization (xref / page tree / content streams), reading-order layout
  segmentation, deterministic OCR-fallback classification — all executed
  executor-side inside Arrow-batched ``mapInPandas`` stages (the reference
  runs the equivalent work in a sequential driver loop,
  ``processors/ocr.py:150-202``).
- reassembly: offset-sorted span sequences via
  ``posexplode`` → ``collect_list(struct)`` → ``array_sort`` — never
  per-row Python.
- resume: per-partition checkpoint lineage with idempotent deterministic
  result ids (reference analogue: ``managers/state.py`` + the streaming
  checkpoint at ``handlers/autoloader.py:104``).
"""

__version__ = "0.1.0"
