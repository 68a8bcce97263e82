"""URL canonicalization for web-corpus curation.

Crawled corpora address the same page many ways — mixed-case hosts,
default ports, tracking parameters, shuffled query order, trailing
slashes, fragments. Deduplicating by raw URL string misses all of them;
canonicalizing first collapses the variants so URL-level dedup and
host-level aggregation see one key per page.

Everything here is a Catalyst column expression (regexp + array HOFs):
no UDFs, no shuffle — canonicalization is a narrow projection that
pipelines into whatever groupBy/join consumes the canonical key.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tracking parameters stripped during canonicalization. Anchored
# match against `name=` OR bare `name` (real crawls carry valueless
# `?fbclid` / `?utm_source` segments — review finding, round 4), while
# `reference=` is still NOT stripped by the `ref` rule: the name must
# end at `=` or end-of-segment.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL.

    Rules (the common subset of RFC 3986 §6 normalization plus
    tracking-param removal):

    * scheme and host lowercased;
    * default port stripped (``:443`` for https, ``:80`` for http);
    * fragment dropped;
    * query parameters: tracking params (``utm_*``, ``fbclid``,
      ``gclid``, ``ref``) and empty segments removed, the rest sorted
      byte-wise and re-joined with ``&`` (``?`` dropped when nothing
      survives);
    * trailing slashes stripped from the path (root collapses to the
      bare authority).

    Composition of ``regexp_extract`` / ``filter`` / ``array_sort`` —
    stays inside whole-stage codegen.
    """
    defragged = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(defragged, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(defragged, r"^[^:]+://([^/?#]*)", 1))
    host = F.when(scheme == "https", F.regexp_replace(hostport, r":443$", "")).when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).otherwise(hostport)
    path = F.regexp_extract(defragged, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(defragged, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (~p.rlike(TRACKING_PARAM_RE)) & (p != ""),
        )
    )
    qstr = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qstr == "", F.lit("")).otherwise(F.concat(F.lit("?"), qstr)),
    )


def duckdb_canonicalize_url(url_expr: str) -> str:
    """The oracle twin of :func:`canonicalize_url` as a DuckDB SQL
    expression — an independent re-implementation (DuckDB list lambdas
    vs Catalyst HOFs) of the same normalization rules."""
    d = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({d}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = f"lower(regexp_extract({d}, '^[^:]+://([^/?#]*)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '') "
        f"WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '') "
        f"ELSE {hostport} END"
    )
    path = (
        f"regexp_replace(regexp_extract({d}, '^[^:]+://[^/?#]*([^?#]*)', 1),"
        f" '/+$', '')"
    )
    query = f"regexp_extract({d}, '\\?([^#]*)', 1)"
    # array_to_string over an EMPTY list yields NULL in DuckDB (Spark's
    # array_join yields '') — coalesce to keep the engines aligned
    qstr = (
        f"coalesce(array_to_string(list_sort(list_filter(str_split({query}, '&'), "
        f"p -> NOT regexp_matches(p, '{TRACKING_PARAM_RE}') AND p <> '')), '&'), '')"
    )
    return (
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {qstr} = '' THEN '' ELSE concat('?', {qstr}) END)"
    )
