"""Per-turn format detection and parse dispatch.

Mirrors the reference's extension-based router
(/root/reference/services/parse_manager.py:74-95, 128-176) — but transcripts
carry no filename, so format is detected from payload shape (FIXTURES.md §1):

- ``{"pages":``  prefix → PDF-like glyph document
- ``<w:document`` prefix → DOCX-like WordprocessingML
- ``<!doctype html`` / ``<html`` prefix → HTML (boilerplate-strip extension)
- markdown block markers → markdown
- anything else → plain text

Equality semantics per format:
- plaintext  → txt converter (one node; flatten ≈ text + "\\n\\n")
- markdown   → the reference treats .md as plain text at domtree level
  (parse_manager.py:143-153), so ``extracted_text`` uses the txt rule while
  ``domtree_json`` carries the richer block-tokenizer tree (axis B).
- docx-like  → XML walk tree; text via the layout semantics
- pdf-like   → full layout pipeline; text = tree markdown flatten

``parse_payload`` is a pure function str → dict; the Spark engine maps it
over Arrow batches (no per-row Python UDFs).
"""

from __future__ import annotations

import re
from typing import Optional

from bella_domify_spark.parsers import csvlike, docxlike, markdown, txt, xlsxlike
from bella_domify_spark.parsers.pdflike import pipeline as pdfpipe

FMT_PDF = "pdflike"
FMT_DOCX = "docxlike"
FMT_MD = "markdown"
FMT_TXT = "plaintext"
FMT_XLSX = "xlsxlike"
FMT_PPTX = "pptxlike"
FMT_HTML = "htmllike"
FMT_EMPTY = "empty"

_MD_HINTS = re.compile(
    r"(?m)^(#{1,6}\s+\S|```|\|.+\|\s*$|[-*+]\s+\S|\d{1,9}[.)]\s+\S)"
)


def detect_format(text: Optional[str]) -> str:
    if text is None or text == "":
        return FMT_EMPTY
    head = text.lstrip()[:64]
    if head.startswith('{"pages"'):
        return FMT_PDF
    if head.startswith('{"sheets"'):
        return FMT_XLSX
    if head.startswith('{"slides"'):
        return FMT_PPTX
    if head.startswith("<w:document") or head.startswith("<document"):
        return FMT_DOCX
    low = head[:16].lower()
    if low.startswith("<!doctype html") or low.startswith("<html"):
        return FMT_HTML
    if _MD_HINTS.search(text):
        return FMT_MD
    return FMT_TXT


def parse_payload(text: Optional[str], image_provider=None) -> dict:
    """Parse one turn payload → extraction record. Never raises: errors are
    reported in the ``status`` column (per-page error isolation analogue,
    reference pdf/converter.py:160-166). ``image_provider`` (a
    providers.ImageStorageProvider) enables the Figure link/OCR path for
    pdf-format payloads — None keeps placeholders, like the reference with
    no parser_context provider bound."""
    fmt = detect_format(text)
    if fmt == FMT_EMPTY:
        return {"extracted_text": "", "domtree_json": None, "fmt": fmt,
                "n_nodes": 0, "status": "skipped_empty"}
    try:
        if fmt == FMT_PDF:
            tree = pdfpipe.parse(text, image_provider=image_provider)
            extracted = tree.to_markdown()
        elif fmt == FMT_XLSX:
            tree = xlsxlike.build_domtree(text)
            extracted = tree.to_markdown()
        elif fmt == FMT_PPTX:
            # layout-only format in the reference (no pptx domtree
            # converter exists); extracted text = the layout flat text,
            # tree = one node carrying it
            from bella_domify_spark.parsers import pptxlike
            extracted = pptxlike.flat_text(text)
            tree = txt.parse(extracted)
        elif fmt == FMT_DOCX:
            tree = docxlike.parse(text)
            extracted = tree.to_markdown()
        elif fmt == FMT_HTML:
            # ENGINE EXTENSION: the reference routes .html through its txt
            # converter (parse_manager.py:90-95); the north star asks for
            # true boilerplate strip + DOM heuristics — see htmllike.py
            from bella_domify_spark.parsers import htmllike
            tree = htmllike.parse(text)
            extracted = tree.to_markdown()
        elif fmt == FMT_MD:
            # equality target: txt semantics; tree: block tokenizer
            extracted = txt.extract_text(text)
            tree = markdown.parse(text)
        else:
            tree = txt.parse(text)
            extracted = tree.to_markdown()
        dom_json = tree.to_json()
        n_nodes = dom_json.count('"element":{') if dom_json else 0
        return {"extracted_text": extracted, "domtree_json": dom_json,
                "fmt": fmt, "n_nodes": n_nodes, "status": "ok"}
    except Exception as e:  # noqa: BLE001 — never fail the job for one turn
        return {"extracted_text": "", "domtree_json": None, "fmt": fmt,
                "n_nodes": 0, "status": f"error:{type(e).__name__}:{e}"[:200]}


__all__ = [
    "detect_format",
    "parse_payload",
    "csvlike",
    "FMT_PDF", "FMT_DOCX", "FMT_MD", "FMT_TXT", "FMT_XLSX", "FMT_PPTX",
    "FMT_EMPTY",
]
