"""MIME inference and download predicates.

Reproduces src/shared/download-utils.ts:8-73: the 30-entry extension→MIME
table, ``inferContentType`` (default application/octet-stream),
``isPdfFile`` and the Playwright download-error sniff.
"""

from __future__ import annotations

import re

MIME_TYPES = {
    # Documents
    ".pdf": "application/pdf",
    ".doc": "application/msword",
    ".docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".xls": "application/vnd.ms-excel",
    ".xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    ".ppt": "application/vnd.ms-powerpoint",
    ".pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    ".odt": "application/vnd.oasis.opendocument.text",
    ".ods": "application/vnd.oasis.opendocument.spreadsheet",
    ".odp": "application/vnd.oasis.opendocument.presentation",
    ".rtf": "application/rtf",
    ".txt": "text/plain",
    ".csv": "text/csv",
    # Archives
    ".zip": "application/zip",
    ".rar": "application/vnd.rar",
    ".7z": "application/x-7z-compressed",
    ".tar": "application/x-tar",
    ".gz": "application/gzip",
    # Images
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".png": "image/png",
    ".gif": "image/gif",
    ".webp": "image/webp",
    ".svg": "image/svg+xml",
    # Media
    ".mp3": "audio/mpeg",
    ".mp4": "video/mp4",
    ".wav": "audio/wav",
    ".avi": "video/x-msvideo",
    # Web
    ".html": "text/html",
    ".htm": "text/html",
    ".xml": "application/xml",
    ".json": "application/json",
}

_EXT_RE = re.compile(r"\.[^.]+$")

DOWNLOAD_ERROR_MARKERS = ("Download is starting", "net::ERR_ABORTED")


def infer_content_type(filename: str | None) -> str:
    if not filename:
        return "application/octet-stream"
    m = _EXT_RE.search(filename.lower())
    if not m:
        return "application/octet-stream"
    return MIME_TYPES.get(m.group(0), "application/octet-stream")


def is_pdf_file(filename: str | None) -> bool:
    return bool(filename) and filename.lower().endswith(".pdf")


def is_download_error(content: str | None) -> bool:
    if not content:
        return False
    return any(marker in content for marker in DOWNLOAD_ERROR_MARKERS)
