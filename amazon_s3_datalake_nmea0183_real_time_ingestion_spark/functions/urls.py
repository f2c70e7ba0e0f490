"""URL parsing expressions for web-scraped corpus curation.

Built on Spark's JVM-side ``parse_url`` (host/path/query-param
extraction) plus a registered-domain regex.  Patterns stick to literal
character classes so the same regex is valid in Java regex (Spark) and
RE2 (DuckDB / engine oracles) — no ``\\d`` shorthands, no backrefs.

Reference parity: the reference repo stores raw payloads and leaves all
analytics to Athena SQL (cdk_datalake_mvp/hello.py); URL canonicalization
is part of the Tier C training-data extension surface (per-domain
filtering, dedup-by-canonical-URL, robots/quality joins all key on the
registered domain).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# last two dot-separated labels of the host — the "registered domain"
# under a single-label public suffix (full PSL handling would broadcast
# the suffix list as a dim table and longest-suffix join against it).
REGISTERED_DOMAIN_PATTERN = "([a-z0-9-]+[.][a-z]+)$"


# try_parse_url, not parse_url: ANSI mode is on and plain parse_url THROWS
# on any malformed URL — one bad row in a 100 TB web crawl would kill the
# whole job. NULL rows drop out of downstream joins/quotas instead.

def url_host(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(c, F.lit("HOST"))


def url_path(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(c, F.lit("PATH"))


def url_query_param(url: Column | str, key: str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(c, F.lit("QUERY"), F.lit(key))


def registered_domain(host: Column | str) -> Column:
    """example.org from news.example.org (single-label-suffix heuristic)."""
    c = F.col(host) if isinstance(host, str) else host
    return F.regexp_extract(c, REGISTERED_DOMAIN_PATTERN, 1)
