"""Text scalar functions (SURVEY.md §2.7 F1-F17) — all pure Column
expressions mirroring the reference's string handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Allowed emotions — reference backend/models.py:15-21; normalization
# whitelist backend/langchain_utils.py:177-182.
EMOTIONS = ("happy", "explaining", "thinking", "encouraging", "neutral")

# Allowed upload extensions — reference backend/config.py:27.
ALLOWED_EXTENSIONS = (".pdf", ".docx", ".html")


def file_hash(content: Column) -> Column:
    """F1 — SHA-256 dedup key (reference backend/file_utils.py:9-28).
    ``sha2`` streams on the JVM; no 4 KB manual blocking needed."""
    return F.sha2(content, 256)


def basename(path: Column) -> Column:
    """Strip any directory components (os.path.basename equivalent)."""
    return F.regexp_extract(path, r"([^/\\]*)$", 1)


def sanitize_filename(name: Column) -> Column:
    """F2 — filename sanitizer (reference backend/file_utils.py:30-57):
    basename → whitelist [A-Za-z0-9._-] (others → '_') → empty becomes
    'unnamed_file' → leading dot gets 'file_' prefix."""
    base = basename(name)
    clean = F.regexp_replace(base, r"[^A-Za-z0-9._-]", "_")
    clean = F.when(F.coalesce(clean, F.lit("")) == "", F.lit("unnamed_file")).otherwise(clean)
    return F.when(clean.startswith("."), F.concat(F.lit("file_"), clean)).otherwise(clean)


def file_suffix(name: Column) -> Column:
    """F3 — lowercase extension (Path(name).suffix.lower(); reference
    backend/file_utils.py:70)."""
    return F.lower(F.regexp_extract(name, r"(\.[^.\\/]+)$", 1))


def has_allowed_extension(name: Column) -> Column:
    """P5 — extension whitelist (reference backend/file_utils.py:59-71)."""
    return file_suffix(name).isin(*ALLOWED_EXTENSIONS)


def preview(text: Column, n: int = 50) -> Column:
    """F4 — 50-char preview + ellipsis (frontend/src/App.js:71)."""
    return F.concat(F.substring(text, 1, n), F.lit("..."))


def strip_llm_artifacts(raw: Column) -> Column:
    """F6/F10 — remove common LLM-wrapping noise before JSON parsing
    (reference backend/langchain_utils.py:125-155): code fences and
    'Here is ...:'-style prefixes."""
    out = F.regexp_replace(raw, r"```(?:json)?", "")
    out = F.regexp_replace(out, r"(?i)^\s*here(?:'s| is)[^:{]*:\s*", "")
    return F.trim(out)


def brace_window(raw: Column) -> Column:
    """F7 — substring from first '{' to last '}' (reference
    backend/langchain_utils.py:149-155); greedy regex."""
    return F.regexp_extract(raw, r"(\{[\s\S]*\})", 1)


def normalize_emotion(emotion: Column) -> Column:
    """F9 — lowercase + whitelist else 'neutral' (reference
    backend/langchain_utils.py:177-182)."""
    low = F.lower(F.trim(emotion))
    return F.when(low.isin(*EMOTIONS), low).otherwise(F.lit("neutral"))


def parse_llm_response(raw: Column) -> Column:
    """F8 — defensive JSON parse of the LLM's ``{"answer","emotion"}``
    contract (reference backend/langchain_utils.py:105-206): clean
    artifacts, extract the brace window, from_json, fall back to the raw
    text as the answer and 'neutral' as the emotion.

    Returns a struct<answer string, emotion string>.
    """
    cleaned = strip_llm_artifacts(raw)
    window = brace_window(cleaned)
    parsed = F.from_json(window, "answer STRING, emotion STRING")
    answer = F.coalesce(parsed["answer"], F.nullif(F.trim(raw), F.lit("")))
    emotion = normalize_emotion(F.coalesce(parsed["emotion"], F.lit("neutral")))
    return F.struct(
        F.regexp_replace(answer, r"[{}]", "").alias("answer"),
        emotion.alias("emotion"),
    )


def strip_markdown(text: Column) -> Column:
    """F16 — markdown removal before TTS (frontend
    ChatInterface.js:224): strip emphasis/heading/link/code markers."""
    out = F.regexp_replace(text, r"```[\s\S]*?```", " ")
    out = F.regexp_replace(out, r"`([^`]*)`", r"$1")
    out = F.regexp_replace(out, r"\[([^\]]*)\]\([^)]*\)", r"$1")
    out = F.regexp_replace(out, r"[*_~#>]+", "")
    return F.trim(F.regexp_replace(out, r"\s+", " "))
