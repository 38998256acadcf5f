"""Unicode hygiene for web-corpus text (SURVEY §2 op 115).

Real crawl text arrives with BOMs, zero-width characters, C0/C1 controls,
exotic space codepoints, unnormalized combining sequences, and mojibake
(UTF-8 bytes mis-decoded as Latin-1/cp1252 — ``Ã©`` for ``é``). Every
downstream operator in this engine hashes or tokenizes text, so two
visually-identical documents with different codepoint sequences defeat
exact dedup, paragraph dedup, and decontamination. This module is the
fence at the pipeline mouth, split by execution cost:

- :func:`clean_controls` — pure JVM regexp projections (zero shuffle,
  codegen in the scan stage): strip BOM/zero-widths, drop C0/C1 controls
  except tab/newline, map every Unicode space separator to ASCII space.
  Differentially gated against a DuckDB twin built from the SAME
  patterns (both engines' regex dialects support the needed classes).
- :func:`normalize_nfc` — canonical composition (NFC). No Spark builtin
  exists, so this is an Arrow-batched pandas UDF around
  ``unicodedata.normalize`` with a fast pure-ASCII short-circuit (ASCII
  is NFC by construction; web corpora are mostly ASCII, so most batches
  never touch the normalizer). Gated against DuckDB's native
  ``nfc_normalize`` — a true cross-ENGINE differential, not a twin of
  our own code.
- :func:`fix_mojibake` — the ftfy-core heuristic, deterministic and
  conservative: re-encode as Latin-1/cp1252 and re-decode as UTF-8;
  apply ONLY when the round-trip succeeds and strictly reduces the
  count of mojibake indicator characters. One pass (no iterated
  fixing), Arrow-batched, gated against an independent pure-Python
  reference on planted double-encodings plus a no-false-positive sweep
  over clean multilingual text.

The reference has no text surface at all (its one query is
``/root/reference/src/dwca_parquet/templates/query.sql:1-5``); this
extends the engine's LLM-pipeline family (SURVEY §2.F absences).

Scale: clean_controls rides the scan; the Python stages are per-row
Arrow batches with no state and no shuffle — they pipeline with
whatever projection precedes them and parallelize embarrassingly.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# BOM + zero-width family (ZWSP, ZWNJ, ZWJ, word-joiner) — removed.
_ZW = "\\x{FEFF}\\x{200B}\\x{200C}\\x{200D}\\x{2060}"
# C0 controls except \t \n (\r is normalized to nothing by the line
# discipline downstream ops already apply) + DEL + C1 block — removed.
_CTRL = "\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{0080}-\\x{009F}"
# Unicode space separators (Zs) that are not plain ASCII space, plus the
# line/paragraph separators — mapped to ' '.
_SPACES = (
    "\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}"
    "\\x{2028}\\x{2029}"
)

# DuckDB (RE2) spells the same classes with \x{....} too — keep ONE
# pattern string per rule so the twin cannot drift.
_RE_DROP = f"[{_ZW}{_CTRL}]"
_RE_SPACE = f"[{_SPACES}]"


def clean_controls_col(col: Column) -> Column:
    """JVM-side control/zero-width strip + space normalization."""
    c = F.regexp_replace(col, _RE_DROP, "")
    return F.regexp_replace(c, _RE_SPACE, " ")


def clean_controls(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) with BOM/zero-widths/controls removed and every
    Unicode space separator mapped to ASCII space. Zero shuffle."""
    return df.select(
        F.col(id_col), clean_controls_col(F.col(text_col)).alias("text")
    )


def sql_clean_controls(source: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`clean_controls` — same pattern strings."""
    return (
        f"SELECT {id_col}, regexp_replace(regexp_replace({text_col}, "
        f"'{_RE_DROP}', '', 'g'), '{_RE_SPACE}', ' ', 'g') AS text "
        f"FROM {source}"
    )


@pandas_udf(StringType())
def _nfc_udf(texts: pd.Series) -> pd.Series:
    def nfc(t):
        if t is None:
            return None
        # ASCII is closed under NFC — skip the normalizer for the
        # overwhelmingly common case
        if t.isascii():
            return t
        return unicodedata.normalize("NFC", t)

    return texts.map(nfc)


def normalize_nfc(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text) canonically composed (NFC). Arrow-batched; gated
    against DuckDB's native nfc_normalize (test_unicode.py)."""
    return df.select(
        F.col(id_col), _nfc_udf(F.col(text_col)).alias("text")
    )


# Mojibake indicators: the Latin-1/cp1252 lead bytes UTF-8 multibyte
# sequences decode to when mis-interpreted — Ã (0xC3), Â (0xC2), plus
# the cp1252 smart-punctuation tells (â€™ etc.).
_INDICATORS = "ÃÂâ€™“”…Ëœ"


def _fix_mojibake_one(t: str) -> str:
    if t is None or t.isascii():
        return t
    before = sum(t.count(ch) for ch in _INDICATORS)
    if before == 0:
        return t
    for enc in ("cp1252", "latin-1"):
        try:
            fixed = t.encode(enc).decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        after = sum(fixed.count(ch) for ch in _INDICATORS)
        if after < before:
            return fixed
    return t


@pandas_udf(StringType())
def _mojibake_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_fix_mojibake_one)


def fix_mojibake(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, text, fixed) — repair UTF-8-as-Latin-1/cp1252 double
    encodings, conservatively: the re-encode/re-decode round-trip must
    succeed AND strictly reduce the mojibake indicator count, else the
    text passes through untouched. ``fixed`` flags changed rows so
    callers can audit the repair rate before trusting it."""
    out = df.select(
        F.col(id_col),
        F.col(text_col).alias("_orig"),
        _mojibake_udf(F.col(text_col)).alias("text"),
    )
    return out.select(
        F.col(id_col),
        F.col("text"),
        (F.col("text") != F.col("_orig")).alias("fixed"),
    )
