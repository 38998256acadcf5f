"""HTML → clean text extraction for crawl-derived corpora.

Completes the WARC pipeline (``sources/warc.py`` reads Common-Crawl-style
archives; this module turns the HTML payloads into training text) — the
boilerplate-removal step every web-scale pretraining corpus runs (C4,
RefinedWeb, FineWeb all start from exactly this shape; see PAPERS.md).
Reference parity note: the reference engine (NINAnor/dwca-parquet) has no
crawl path — this is part of the LLM-pipeline tier the assignment adds on
top of the reference surface.

Design constraints, in order:

1. **Scan-stage only.** The whole extraction is a pipeline of JVM regex
   projections (``regexp_replace``/``regexp_extract``/``regexp_count``)
   — zero shuffle, whole-stage codegen, scales with input splits. No
   Python in the hot path, no DOM parse (a DOM library is neither
   available in this container nor shuffle-friendly; a real deployment
   can swap a Pandas-UDF'd parser into the same column contract).
2. **Engine-portable semantics.** Every pattern is valid and identical
   in Java regex (Spark) and RE2 (DuckDB): no backreferences, no
   lookaround — so the exact same pass sequence is expressible as a SQL
   oracle (see :func:`sql_html_extract_text`) and the operator is
   differentially gated like the driver queries.
3. **Deterministic, documented approximation.** Tag-stripping by regex
   is exact on well-formed markup and degrades predictably on
   pathological nesting (a ``<script>`` inside an HTML comment, say).
   The passes below run in a fixed order; both engines run the same
   order, so parity holds even on pathological inputs.

Pass order (each a single ``regexp_replace``):

1. remove HTML comments ``<!-- ... -->`` (non-greedy, dotall)
2. remove non-content elements WITH their contents: script, style,
   noscript, svg, head, nav, header, footer, aside, form, iframe,
   template (case-insensitive, non-greedy, dotall)
3. block-level tags (p, div, br, li, tr, h1-h6, section, article, ...)
   → newline, so paragraph structure survives as line breaks
4. every remaining tag → single space
5. decode the fixed named-entity set (``&amp;`` LAST — decoding it
   first would double-decode ``&amp;lt;`` into ``<``)
6. collapse runs of spaces/tabs, collapse blank lines, trim

Output columns: ``text`` (clean), ``title`` (first <title> payload,
'' when absent), ``n_links`` (count of <a ...> opening tags in the raw
input — the link-density signal quality filters use).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# elements whose CONTENT is boilerplate/noise, removed wholesale
_DROP_ELEMENTS = (
    "script",
    "style",
    "noscript",
    "svg",
    "head",
    "nav",
    "header",
    "footer",
    "aside",
    "form",
    "iframe",
    "template",
)

# tags that imply a line break in rendered text (opening or closing)
_BLOCK_TAGS = (
    "p",
    "div",
    "br",
    "li",
    "ul",
    "ol",
    "tr",
    "table",
    "h1",
    "h2",
    "h3",
    "h4",
    "h5",
    "h6",
    "section",
    "article",
    "blockquote",
    "pre",
    "hr",
)

# fixed named entities, decoded in this order (&amp; MUST be last)
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

_COMMENT_RE = r"(?s)<!--.*?-->"
_DROP_RE = (
    r"(?is)<(?:" + "|".join(_DROP_ELEMENTS) + r")\b.*?</(?:"
    + "|".join(_DROP_ELEMENTS)
    + r")\s*>"
)
_BLOCK_RE = r"(?i)</?(?:" + "|".join(_BLOCK_TAGS) + r")\b[^>]*>"
_ANY_TAG_RE = r"(?s)<[^>]*>"
_TITLE_RE = r"(?is)<title\b[^>]*>(.*?)</title\s*>"
_LINK_RE = r"(?i)<a\s"


def clean_text_col(html: Column) -> Column:
    """The 6-pass extraction as a single column expression."""
    c = F.regexp_replace(html, _COMMENT_RE, " ")
    c = F.regexp_replace(c, _DROP_RE, " ")
    c = F.regexp_replace(c, _BLOCK_RE, "\n")
    c = F.regexp_replace(c, _ANY_TAG_RE, " ")
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"[ \t\r]+", " ")  # runs of horizontal space
    c = F.regexp_replace(c, r" ?\n ?", "\n")  # space around breaks
    c = F.regexp_replace(c, r"\n+", "\n")  # blank lines
    # trim() strips spaces only (both engines) — strip newlines too
    return F.regexp_replace(c, r"^[ \n]+|[ \n]+$", "")


def html_extract_text(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """(id, text, title, n_links) — clean training text from raw HTML.

    Pure projections; composes directly with the quality/dedup operators
    downstream (``text_stats``, ``quality_score``, ``minhash_dup_pairs``).
    """
    raw = F.col(html_col)
    return df.select(
        F.col(id_col),
        clean_text_col(raw).alias("text"),
        F.trim(F.regexp_replace(
            F.coalesce(F.regexp_extract(raw, _TITLE_RE, 1), F.lit("")),
            r"[ \t\r\n]+",
            " ",
        )).alias("title"),
        F.regexp_count(raw, F.lit(_LINK_RE)).cast("long").alias("n_links"),
    )


def _sql_escape(pat: str) -> str:
    return pat.replace("'", "''")


def sql_html_extract_text(source: str, id_col: str, html_col: str) -> str:
    """The identical pass sequence as DuckDB SQL — the differential oracle.

    DuckDB's regexp_replace needs the explicit ``'g'`` flag (Spark's
    replaces all matches by default); everything else is shared RE2-safe
    syntax.
    """
    c = html_col
    # replacement literals embed a REAL newline character (SQL string
    # literals may span lines) — a '\n' escape in a DuckDB replacement
    # would be backslash-n, not a line break
    for pat, rep in [
        (_COMMENT_RE, " "),
        (_DROP_RE, " "),
        (_BLOCK_RE, "\n"),
        (_ANY_TAG_RE, " "),
    ]:
        c = f"regexp_replace({c}, '{_sql_escape(pat)}', '{rep}', 'g')"
    for ent, rep in _ENTITIES:
        c = f"replace({c}, '{ent}', '{_sql_escape(rep)}')"
    c = f"regexp_replace({c}, '[ \\t\\r]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\n ?', '\n', 'g')"
    c = f"regexp_replace({c}, '\\n+', '\n', 'g')"
    c = f"regexp_replace({c}, '^[ \\n]+|[ \\n]+$', '', 'g')"
    title = (
        f"trim(regexp_replace(coalesce(regexp_extract({html_col}, "
        f"'{_sql_escape(_TITLE_RE)}', 1), ''), '[ \\t\\r\\n]+', ' ', 'g'))"
    )
    links = (
        f"CAST(len(regexp_extract_all({html_col}, "
        f"'{_sql_escape(_LINK_RE)}')) AS BIGINT)"
    )
    return (
        f"SELECT {id_col}, {c} AS text, {title} AS title, "
        f"{links} AS n_links FROM {source}"
    )
