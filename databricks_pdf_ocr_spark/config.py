"""Engine configuration.

Reference analogue: Dynaconf settings + ``PDFOCRConfig``
(``config.py:17-95``, ``settings.toml``).  We keep the same knobs that
shaped the reference's behavior (max payload size guard, page cap, batch
caps) plus the scale knobs the north rule mandates (salt buckets,
partition counts).
"""

from __future__ import annotations

from dataclasses import dataclass, asdict
import json


@dataclass(frozen=True)
class ExtractConfig:
    """Knobs for the extraction job.

    - ``max_payload_bytes``: per-span size guard; oversized payloads become
      ``status='failed'`` rows and the pipeline continues (reference:
      50 MB guard, ``config.py:88-95`` applied at ``processors/ocr.py:93-98``).
    - ``max_pages_per_doc``: page-count truncation (reference:
      ``images[:max_pages_per_pdf]``, ``processors/ocr.py:106-107``).
    - ``max_docs_per_run``: per-run work cap (reference:
      ``settings.toml:21`` applied at ``processors/ocr.py:85``).
    - ``n_buckets``: checkpoint / lineage granularity — work is hashed into
      ``pmod(xxhash64(doc_id), n_buckets)`` buckets; resume skips buckets
      already marked done.
    - ``shuffle_partitions``: target partition count for the extraction
      repartition; at cluster scale set to ~2-3x total cores.
    - ``arrow_batch_rows``: cap on rows per Arrow batch entering the
      pandas-UDF stage — documents carry multi-MB payloads, so batches must
      be bounded by bytes-in-flight, not the 10k default (SURVEY.md §4.2.4).
    """

    max_payload_bytes: int = 50 * 1024 * 1024
    max_pages_per_doc: int = 1000
    max_docs_per_run: int | None = None
    processing_mode: str = "incremental"  # incremental | reprocess_all | reprocess_specific
    specific_doc_ids: tuple[str, ...] = ()
    n_buckets: int = 64
    shuffle_partitions: int = 32
    arrow_batch_rows: int = 256
    #: bounded retry for transient-class kernel errors (the reference
    #: declares max_retries/retry_delay, settings.toml:26-27, without
    #: implementing them; functions/extract_span.py does)
    max_retries: int = 2
    retry_backoff_s: float = 0.0
    ocr_model: str = "ocr-fallback-deterministic-v1"
    #: repartition spans on (doc_id, offset) before extraction.  OFF by
    #: default: shuffling raw payload bytes is the wrong plan at 100 TB —
    #: extraction is a narrow map over the scan, and the only shuffle
    #: should be the (far smaller) extracted-text reassembly.  Turn ON
    #: when input files are skewed (single docs comparable to a whole
    #: split, e.g. multi-thousand-page PDFs packed into few files).
    salt_spans: bool = False

    def to_json(self) -> str:
        d = asdict(self)
        d["specific_doc_ids"] = list(d["specific_doc_ids"])
        return json.dumps(d, sort_keys=True)


#: Small-payload config used by unit tests — a 64 KiB size guard lets
#: fixtures exercise the oversize-failure path cheaply.
TEST_CONFIG = ExtractConfig(max_payload_bytes=64 * 1024, max_pages_per_doc=16,
                            n_buckets=8, shuffle_partitions=8,
                            salt_spans=True)  # tests exercise the salted path
