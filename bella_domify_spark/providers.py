"""Provider seam for image storage + OCR (SURVEY.md §2 S5/F10).

Mirrors the reference's provider layer:

- ``ImageStorageProvider`` ABC — upload/download + ``get_pic_url_and_ocr``
  with the >28 px minimum-size gate and the swallow-errors contract
  (/root/reference/doc_parser/dom_parser/provider/image_provider.py:9-58).
- The production implementations are network services: S3 storage
  (services/provider/s3_image_provider.py) and a vision-model OCR call
  (doc_parser/dom_parser/parsers/pdf/common/ocr.py ``llm_image2text``).
  Neither is available in this environment, so the shipped implementation
  is a DETERMINISTIC stub (``StubImageProvider``) that content-addresses
  the image metadata and echoes it as OCR text — the same pattern as
  ops/multimodal.py's fake codec. The plumbing the stub exercises is real
  and oracle-gated (``layout_ocr_text`` query): how a provider threads
  through ``pipeline.parse`` into the Figure markdown path
  (domtree.py:239-242 — ``![Figure](url)`` + ``> ``-quoted OCR) and
  through ``layout_flat.layout_parse`` into ``SimpleBlock.ocr_result``
  (simple_block.py:25-38, pic_parser.py:20-29).

The payload model carries image *metadata* (bbox, synthetic byte length,
content hash) instead of pixel bytes — the decode step is exactly where
PIL sits in the reference (image_provider.py:28-44), so the size gate
reads the metadata dims and a real deployment overrides ``ocr()``.
"""

from __future__ import annotations

import hashlib
import json
from abc import ABC, abstractmethod
from typing import Optional, Tuple

#: both dimensions must EXCEED this for OCR to run (image_provider.py:28)
MIN_OCR_SIZE = 28.0


def _image_dims(image: dict) -> Tuple[float, float]:
    """(width, height) from explicit fields or the bbox. Raises on
    malformed metadata — callers treat that like the reference treats an
    unreadable byte stream (PIL open failure → too small / no OCR)."""
    if "width" in image or "height" in image:
        return float(image.get("width", 0.0)), float(image.get("height", 0.0))
    b = image["bbox"]
    return float(b[2]) - float(b[0]), float(b[3]) - float(b[1])


class ImageStorageProvider(ABC):
    """Upload/download + OCR orchestration (image_provider.py:9-58)."""

    @abstractmethod
    def upload(self, image: dict) -> str:
        """Store the image, return its unique key."""

    @abstractmethod
    def download(self, file_key: str) -> str:
        """Key → retrievable URL."""

    def ocr(self, image: dict, user: str = "") -> str:
        """The vision-model text call (ocr.llm_image2text) — a network
        service in production; deployments must override."""
        raise NotImplementedError(
            "vision OCR requires a network provider; use StubImageProvider "
            "for deterministic offline runs")

    def is_image_large_enough(self, image: dict,
                              min_size: float = MIN_OCR_SIZE) -> bool:
        """Reference gate (image_provider.py:28-44): width AND height must
        exceed ``min_size``; any failure to read dims → False."""
        try:
            w, h = _image_dims(image or {})
            return w > min_size and h > min_size
        except Exception:  # noqa: BLE001 — unreadable metadata, like PIL fail
            return False

    def get_pic_url_and_ocr(self, image: Optional[dict],
                            user: str = "") -> Tuple[str, str]:
        """(url, ocr_text); errors are swallowed into empty strings and
        small images skip OCR (image_provider.py:20-58)."""
        image = image or {}
        image_url = ""
        try:
            file_key = self.upload(image)
            image_url = self.download(file_key)
            if self.is_image_large_enough(image):
                ocr_text = self.ocr(image, user)
            else:
                ocr_text = ""
        except Exception:  # noqa: BLE001 — never fail the parse for one image
            ocr_text = ""
        return image_url, ocr_text


class StubImageProvider(ImageStorageProvider):
    """Deterministic offline provider.

    - ``upload`` content-addresses the metadata: the payload's ``sha``
      field when present (what md5 over real bytes would give — synthdocs
      derives it from the image's content-identity), else md5 of the
      canonical metadata JSON.
    - ``download`` returns a ``stub://images/<key>`` URL.
    - ``ocr`` echoes the metadata: ``[stub-ocr <w>x<h> <n>B <key8>]`` —
      deterministic, so the gate fixture pins it exactly.
    """

    def upload(self, image: dict) -> str:
        sha = image.get("sha")
        if sha:
            return str(sha)
        blob = json.dumps(image, sort_keys=True, separators=(",", ":"))
        return hashlib.md5(blob.encode("utf-8")).hexdigest()[:16]

    def download(self, file_key: str) -> str:
        return f"stub://images/{file_key}"

    def ocr(self, image: dict, user: str = "") -> str:
        w, h = _image_dims(image)
        return (f"[stub-ocr {int(w)}x{int(h)} "
                f"{int(image.get('n_bytes', 0))}B {self.upload(image)[:8]}]")
