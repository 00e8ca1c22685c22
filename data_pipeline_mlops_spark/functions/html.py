"""HTML -> text extraction for web-crawl corpora.

A 100 TB pretraining corpus starts as crawled HTML; before any quality
or dedup tier runs, the markup has to come off. The reference repo
never gets this far (its documents arrive as plain text), so this
module is a beyond-parity operator in the training-data-pipeline tier,
in the same family as C4/CCNet's extraction stage.

Engineering posture: the whole stripper is a chain of JVM-side
``regexp_replace`` / ``replace`` expressions — no UDF, no Python in
the hot path — so extraction runs at scan speed inside whole-stage
codegen and is trivially map-side (zero shuffles). Every pattern is
written in the common subset of Java regex and RE2 (no backreferences,
no lookaround) so the DuckDB oracle can replay extraction verbatim.

Scope (deliberate): tag/script/style/comment removal, block-tag
newline normalization, the six ubiquitous character entities, and
whitespace canonicalization. Full HTML5 tokenization (CDATA edge
cases, raw-text escapes, the 2000-entity table) is out of scope for a
filter whose job is to feed text heuristics, not render pages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# script/style bodies vanish entirely (their text is code, not prose).
# Two rules, not one with a backreference: RE2 (the oracle engine) has
# no backreferences.
_RE_SCRIPT = r"(?is)<script\b[^>]*>.*?</script\s*>"
_RE_STYLE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_RE_COMMENT = r"(?s)<!--.*?-->"
# block-level boundaries become newlines so downstream line-level
# filters (trim_lines) see real line structure, not tag soup
_RE_BLOCK = r"(?i)</?(?:br|p|div|li|tr|h[1-6]|title|ul|ol|table)\b[^>]*/?>"
_RE_TAG = r"(?s)</?[a-zA-Z!][^>]*>"
# entity decode: fixed common set; &amp; LAST so "&amp;lt;" decodes to
# the literal text "&lt;" (single-pass semantics), not to "<"
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(col: Column | str) -> Column:
    """Markup -> canonical text: drop script/style/comments, turn
    block-tag boundaries into newlines, drop remaining tags, decode
    the common entities, collapse whitespace (newlines preserved as
    single ``\\n``), trim. Pure column expression — composes into any
    plan map-side."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _RE_SCRIPT, " ")
    c = F.regexp_replace(c, _RE_STYLE, " ")
    c = F.regexp_replace(c, _RE_COMMENT, " ")
    c = F.regexp_replace(c, _RE_BLOCK, "\n")
    c = F.regexp_replace(c, _RE_TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[^\S\n]+", " ")  # spaces/tabs -> one space
    c = F.regexp_replace(c, r" ?\n ?", "\n")  # strip space around \n
    c = F.regexp_replace(c, r"\n+", "\n")  # collapse blank lines
    c = F.regexp_replace(c, r"^\s+|\s+$", "")
    return c


def strip_html_sql(expr: str) -> str:
    """The DuckDB replay of :func:`strip_html` for oracle SQL — same
    patterns, same order, RE2 'g' option (Spark's regexp_replace is
    global by default; DuckDB's is not)."""
    c = expr
    for pat in (_RE_SCRIPT, _RE_STYLE, _RE_COMMENT):
        c = f"regexp_replace({c}, '{pat}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_RE_BLOCK}', chr(10), 'g')"
    c = f"regexp_replace({c}, '{_RE_TAG}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    c = f"regexp_replace({c}, '[^\\S\\n]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\n ?', chr(10), 'g')"
    c = f"regexp_replace({c}, '\\n+', chr(10), 'g')"
    c = f"regexp_replace({c}, '^\\s+|\\s+$', '', 'g')"
    return c


def html_extract(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """Extraction as an operator: clean text plus the structural
    signals a crawl-quality gate wants — anchor count and anchor-text
    share (link-farm pages are mostly <a> text), script share, and
    clean-text length. All counts integer-exact; the one double
    (link_text_share) is a single division of two exact ints, which
    IEEE rounds identically in any engine. Map-side only."""
    h = F.col(html_col)
    anchor_texts = F.expr(
        f"regexp_extract_all({html_col}, '(?is)<a\\\\b[^>]*>(.*?)</a\\\\s*>', 1)"
    )
    clean = strip_html(h)
    anchor_clean = F.array_join(
        F.transform(anchor_texts, lambda t: strip_html(t)), " "
    )
    n_clean = F.length(clean)
    n_anchor = F.length(anchor_clean)
    return df.select(
        F.col(id_col),
        clean.alias("text"),
        F.size(anchor_texts).alias("n_links"),
        n_clean.alias("n_chars"),
        F.when(
            n_clean > 0,
            n_anchor.cast("double") / n_clean.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("link_text_share"),
    )
