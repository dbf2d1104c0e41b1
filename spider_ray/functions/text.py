"""Text extraction, PDF sniffing, and training-data text analysis.

Reference semantics reproduced:
- ``strip_html_to_text`` — src/scrapeDocument.ts:207-214 (drop script/style
  blocks, strip tags, collapse whitespace, trim)
- ``extract_html_metadata`` — src/scrapeDocument.ts:192-205 (regex title +
  meta description)
- ``looks_like_pdf`` — src/scrapeDocument.ts:300-303

Engine additions (training-data text ops, all deterministic):
- ``token_count`` (whitespace regex — matched by the DuckDB oracle)
- ``bpe_ish_token_count`` (GPT-2-style pretokenizer regex approximation)
- ``text_stats`` quality metrics
- ``lang_id`` n-gram/stopword heuristic
- ``fingerprint64`` rolling-hash document fingerprint
"""

from __future__ import annotations

import hashlib
import re

_SCRIPT_RE = re.compile(r"<script\b[^<]*(?:(?!</script>)<[^<]*)*</script>", re.IGNORECASE)
_STYLE_RE = re.compile(r"<style\b[^<]*(?:(?!</style>)<[^<]*)*</style>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_TITLE_RE = re.compile(r"<title[^>]*>([^<]+)</title>", re.IGNORECASE)
_DESC_RE = re.compile(
    r"<meta[^>]+name=[\"']description[\"'][^>]+content=[\"']([^\"']+)[\"']",
    re.IGNORECASE,
)


def strip_html_to_text(html: str) -> str:
    out = _SCRIPT_RE.sub("", html)
    out = _STYLE_RE.sub("", out)
    out = _TAG_RE.sub(" ", out)
    return _WS_RE.sub(" ", out).strip()


def extract_html_metadata(html: str) -> dict:
    title = _TITLE_RE.search(html)
    desc = _DESC_RE.search(html)
    return {
        "title": title.group(1).strip() if title else None,
        "description": desc.group(1).strip() if desc else None,
    }


def looks_like_pdf(url: str, content: str) -> bool:
    return (
        url.endswith(".pdf")
        or "application/pdf" in content
        or "%PDF-" in content
    )


# ---------------------------------------------------------------------------
# Training-data text analysis (engine additions; SURVEY.md build plan)
# ---------------------------------------------------------------------------

_WS_SPLIT_RE = re.compile(r"\s+")
# GPT-2-ish pretokenizer approximation without \p classes (stdlib re):
_BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
}
# Tiny per-language trigram profiles for the heuristic language-ID. These are
# hand-picked high-frequency character trigrams (public knowledge).
_LANG_TRIGRAMS = {
    "en": {"the", "and", "ing", "ion", "ent", " th", "he ", "er ", " of", "of "},
    "es": {"de ", " de", "la ", " la", "os ", "as ", "ión", "ent", " el", "el "},
    "de": {"en ", "er ", "ch ", " de", "der", "ie ", "die", "sch", "ein", "und"},
    "fr": {" de", "de ", "es ", "le ", " le", "ent", "la ", " la", "ion", "que"},
}


def token_count(text: str) -> int:
    """Whitespace token count, matching DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` (1 for empty-after-trim,
    matching SQL's single-element split result)."""
    stripped = text.strip()
    if not stripped:
        return 1
    return len(_WS_SPLIT_RE.split(stripped))


def bpe_ish_token_count(text: str) -> int:
    """Approximate BPE token count via a GPT-2-style pretokenizer regex."""
    return len(_BPE_RE.findall(text))


def text_stats(text: str) -> dict:
    """Deterministic quality metrics (SQL-expressible subset)."""
    n_chars = len(text)
    words = _WS_SPLIT_RE.split(text.strip()) if text.strip() else []
    n_words = len(words)
    n_alpha = sum(1 for c in text if c.isalpha())
    n_upper = sum(1 for c in text if c.isupper())
    n_digit = sum(1 for c in text if c.isdigit())
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": (sum(len(w) for w in words) / n_words) if n_words else 0.0,
        "alpha_ratio": (n_alpha / n_chars) if n_chars else 0.0,
        "upper_ratio": (n_upper / n_chars) if n_chars else 0.0,
        "digit_ratio": (n_digit / n_chars) if n_chars else 0.0,
    }


def quality_score(text: str) -> float:
    """Heuristic [0,1] quality score: length band + alpha ratio + stopword hit."""
    stats = text_stats(text)
    length_ok = 1.0 if 20 <= stats["n_chars"] <= 100_000 else 0.0
    words = {w.lower() for w in _WS_SPLIT_RE.split(text.strip())} if text.strip() else set()
    stop_hit = 1.0 if words & _STOPWORDS["en"] else 0.0
    return round(0.4 * length_ok + 0.4 * min(1.0, stats["alpha_ratio"] * 1.25) + 0.2 * stop_hit, 6)


def quality_score_q(text: str) -> int:
    """Integer (ppm) quality score — the same three components as
    ``quality_score`` but quantized so a SQL oracle reproduces it
    bit-for-bit: the two boolean components are exact integers and the
    single float term goes through ``floor(x·400000 + 0.5)`` with the
    identical IEEE-double op order on both sides
    (``n_alpha/n_chars → ·1.25 → min → ·400000 → +0.5 → floor``)."""
    import math

    n_chars = len(text)
    n_alpha = sum(1 for c in text if c.isalpha())
    length_ok = 400_000 if 20 <= n_chars <= 100_000 else 0
    words = {w.lower() for w in _WS_SPLIT_RE.split(text.strip())} if text.strip() else set()
    stop_hit = 200_000 if words & _STOPWORDS["en"] else 0
    alpha = (n_alpha / n_chars) if n_chars else 0.0
    return length_ok + stop_hit + math.floor(min(1.0, alpha * 1.25) * 400_000.0 + 0.5)


def lang_id(text: str) -> str:
    """Character-trigram heuristic language ID over {en, es, de, fr}; 'und'
    when nothing scores."""
    lowered = f" {text.lower()} "
    grams = [lowered[i : i + 3] for i in range(len(lowered) - 2)]
    if not grams:
        return "und"
    best, best_score = "und", 0
    for lang, profile in _LANG_TRIGRAMS.items():
        score = sum(1 for g in grams if g in profile)
        if score > best_score:
            best, best_score = lang, score
    return best


def fingerprint64(text: str, window: int = 16) -> int:
    """Winnowing-style document fingerprint: min of rolling md5 window hashes.

    Deterministic 64-bit fingerprint robust to local edits outside the
    minimal window; whole-text md5 fallback for short inputs.
    """
    data = text.encode("utf-8")
    if len(data) <= window:
        return int.from_bytes(hashlib.md5(data).digest()[:8], "big")
    lo = None
    step = max(1, window // 2)
    for i in range(0, len(data) - window + 1, step):
        h = int.from_bytes(hashlib.md5(data[i : i + window]).digest()[:8], "big")
        if lo is None or h < lo:
            lo = h
    return lo
