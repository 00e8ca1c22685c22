"""URL canonicalization and domain analytics — the web-corpus
curation primitives (C4/CommonCrawl-style pipelines dedup and budget
by CANONICAL URL and sample/block by REGISTERED DOMAIN).

Everything is regexp/expression-based (no UDF): canonicalization and
domain extraction run at parquet-scan speed on 100 TB of crawl
records. Spark's built-in ``parse_url`` covers component extraction
too; the regexp forms below avoid look-arounds so DuckDB's RE2 can
replay the exact same semantics (Java regex allows lookbehind, RE2
does not — a cross-engine trap).

The registered-domain helper takes the last two host labels — the
public-suffix-list (PSL) approximation. Real pipelines load the PSL
as a broadcast table and match longest-suffix; the join shape is
identical, only the rule table grows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"
_TRACKING = r"(utm_[a-z]+|fbclid|gclid|ref)"


def url_host(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)", 1)
    )


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form for URL-level dedup:
    - scheme://host lowercased (path/query case is significant);
    - ``www.`` prefix and default :80/:443 ports dropped;
    - tracking parameters (utm_*, fbclid, gclid, ref) removed
      (three fixed passes — regexp_replace scans past its own
      replacement, so each pass eats one RUN of adjacent tracking
      params; >3 consecutive runs per URL is not a real shape);
    - fragment dropped; dangling ``?``/``&`` and trailing ``/``
      cleaned. Pure regexp chain: map-side, no look-arounds.
    """
    c = F.col(col) if isinstance(col, str) else col
    rest = F.regexp_replace(c, _PREFIX, "")
    s = F.concat(F.lower(F.regexp_extract(c, _PREFIX, 1)), rest)
    s = F.regexp_replace(s, r"^(https?://)www\.", "$1")
    s = F.regexp_replace(s, r"^(https?://[^/?#:]+):(80|443)([/?#])", "$1$3")
    s = F.regexp_replace(s, r"^(https?://[^/?#:]+):(80|443)$", "$1")
    s = F.regexp_replace(s, r"#.*$", "")
    for _ in range(3):
        s = F.regexp_replace(
            s, r"([?&])" + _TRACKING + r"=[^&#]*&", "$1"
        )
    s = F.regexp_replace(s, r"[?&]" + _TRACKING + r"=[^&#]*$", "")
    s = F.regexp_replace(s, r"[?&]$", "")
    # Strip the whole trailing-slash RUN in one pass: "/$" removed
    # only one slash, so "https://a.a//" needed two canonicalization
    # passes to reach a fixed point — a URL-keyed dedup that
    # re-canonicalizes stored keys would miss matches.
    s = F.regexp_replace(s, r"/+$", "")
    return s


def registered_domain(col: Column | str) -> Column:
    """Last two labels of the host (PSL-lite; see module docstring)."""
    h = url_host(col)
    return F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)


def domain_stats(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-registered-domain corpus accounting: docs, distinct
    canonical URLs (URL-level dup pressure), and the min doc id as a
    stable exemplar. One groupBy on the domain key; canonicalization
    is map-side."""
    keyed = df.select(
        F.col(id_col),
        registered_domain(url_col).alias("domain"),
        canonicalize_url(url_col).alias("canonical"),
    )
    return keyed.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("canonical").cast("long").alias("n_canonical"),
        F.min(id_col).alias("exemplar_id"),
    )
