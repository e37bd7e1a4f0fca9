"""extract_span — the pure per-span extraction kernel.

Dispatches one input span ``(kind, text, media_ref)`` to the right
extractor and returns ``(status, error_message, pages_parsed,
ocr_fallbacks, outputs)`` where ``outputs`` is an ordered list of
``(kind, text, media_ref)`` output spans ('text' | 'media').

This is the executor-side unit of work: the Spark job calls it from an
Arrow-batched ``mapInPandas`` stage (batch-level vectorization; the
per-span body is pure Python over bytes, exactly the work the reference
ran in its driver loop at ``processors/ocr.py:87-148``), and the golden
generator calls it from a single-process loop — span-sequence equality
between the two is the correctness contract.

Error contract (reference ``processors/ocr.py:132-148``): any failure
yields ``status='failed'`` with a message; the caller never sees an
exception, and the pipeline continues.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import re
import time

from . import htmlmini, ocr_fallback, pdfmini, segment

Output = tuple[str, str | None, str | None]  # (kind, text, media_ref)

#: transient-class errors: worth retrying (the reference *declares*
#: max_retries/retry_delay for its OCR client, ``settings.toml:26-27``,
#: but never implements them — this wrapper does).  Deterministic
#: failures (parse errors, size guards, bad base64) never retry.
TRANSIENT_ERRORS = (ConnectionError, TimeoutError, InterruptedError)


def _normalize_text(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def extract_span(
    kind: str,
    text: str | None,
    media_ref: str | None,
    *,
    max_payload_bytes: int,
    max_pages: int,
    max_retries: int = 2,
    retry_backoff_s: float = 0.0,
) -> tuple[str, str | None, int, int, list[Output]]:
    """Returns (status, error_message, pages_parsed, ocr_fallbacks, outputs).

    Transient-class errors (``TRANSIENT_ERRORS`` — the kind a real OCR
    backend raises) are retried up to ``max_retries`` times with
    exponential backoff; everything else fails fast (deterministic
    failures don't become cheaper by repeating them).
    """
    attempt = 0
    while True:
        try:
            return _extract_once(kind, text, media_ref,
                                 max_payload_bytes=max_payload_bytes,
                                 max_pages=max_pages)
        except TRANSIENT_ERRORS as e:
            attempt += 1
            if attempt > max_retries:
                return ("failed",
                        f"transient error after {attempt} attempts: "
                        f"{type(e).__name__}: {e}", 0, 0, [])
            if retry_backoff_s:
                time.sleep(retry_backoff_s * (2 ** (attempt - 1)))


def _extract_once(
    kind: str,
    text: str | None,
    media_ref: str | None,
    *,
    max_payload_bytes: int,
    max_pages: int,
) -> tuple[str, str | None, int, int, list[Output]]:
    try:
        if kind == "text":
            if text is None:
                return "failed", "text span with null payload", 0, 0, []
            t = _normalize_text(text)
            return "success", None, 0, 0, ([("text", t, None)] if t else [])

        if kind == "html":
            if text is None:
                return "failed", "html span with null payload", 0, 0, []
            if len(text.encode("utf-8", "ignore")) > max_payload_bytes:
                return "failed", "payload exceeds max size", 0, 0, []
            blocks = htmlmini.extract_blocks(text)
            return "success", None, 0, 0, [("text", b, None) for b in blocks]

        if kind == "pdf":
            if text is None:
                return "failed", "pdf span with null payload", 0, 0, []
            try:
                # tolerate MIME-chunked b64 (Spark's base64() inserts \r\n)
                raw = base64.b64decode(re.sub(r"\s+", "", text), validate=True)
            except (binascii.Error, ValueError):
                return "failed", "invalid base64 pdf payload", 0, 0, []
            # size guard — reference: config.py:88-95 @ processors/ocr.py:93-98
            if len(raw) > max_payload_bytes:
                return ("failed",
                        f"payload exceeds max size ({len(raw)} > {max_payload_bytes})",
                        0, 0, [])
            try:
                pages = pdfmini.parse_pdf(raw)
            except pdfmini.PdfError as e:
                return "failed", f"pdf parse error: {e}", 0, 0, []
            # page truncation — reference: processors/ocr.py:106-107
            pages = pages[:max_pages]
            outputs: list[Output] = []
            fallbacks = 0
            for pg in pages:
                if pg.runs:
                    page_text = segment.reading_order_text(pg.runs)
                    if page_text:
                        outputs.append(("text", page_text, None))
                elif pg.image_bytes:
                    outputs.append(("text",
                                    ocr_fallback.fallback_text(pg.image_bytes[0]),
                                    None))
                    fallbacks += 1
                # blank page: parsed but emits nothing
                # embedded raster images become addressable media spans:
                # content-addressed refs (sha256 of the extracted payload)
                # join back to the media_payloads table the --media-payloads
                # stage materializes from the SAME page_images records —
                # no index coordination between two parsers needed, and
                # identical images dedup globally under one ref
                for rec in pg.images:
                    if rec.get("payload"):
                        ref = "pdfimg:" + hashlib.sha256(
                            rec["payload"]).hexdigest()
                        outputs.append(("media", None, ref))
            return "success", None, len(pages), fallbacks, outputs

        if kind == "image":
            if media_ref is None:
                return "failed", "image span with null media_ref", 0, 0, []
            return "success", None, 0, 0, [("media", None, media_ref)]

        return "failed", f"unknown span kind {kind!r}", 0, 0, []
    except TRANSIENT_ERRORS:
        raise  # bubble to the retry wrapper
    except Exception as e:  # belt-and-braces: never throw out of the kernel
        return "failed", f"unexpected error: {type(e).__name__}: {e}", 0, 0, []
