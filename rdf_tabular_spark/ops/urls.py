"""URL extraction and domain-level curation for a web-scale corpus.

The standard web-data hygiene battery (the C4 / RefinedWeb shape): pull
every URL out of each document, normalize it to a host and a registered
domain, and then (a) drop documents citing blocklisted domains and
(b) report the corpus' domain mix (the input to a rebalance pass,
ops/split.rebalance_mix).

Scale shape — all of it is map-only over the corpus:

- extraction is one ``regexp_extract_all`` projection (JVM regex, no
  Python); the per-document URL list explodes only in the queries that
  need URL-grain rows;
- host/domain normalization is a chain of anchored regex projections on
  the (short) URL strings, never on the document body;
- the blocklist filter against a driver-side list is a pure per-row
  array predicate — zero shuffles for the common case (curated lists
  are 10^2-10^4 domains); the DataFrame variant broadcasts the list and
  semi-joins the narrow (doc, domain) pairs, so the corpus itself still
  never shuffles;
- ``domain_mix`` is one map-side-combined aggregation keyed by domain
  (web domain counts are Zipfian, but partial aggregation caps any hot
  domain at one partial row per upstream partition).

Registered-domain parsing uses a compact two-level public-suffix table
(the common ccTLD second levels) rather than the full Public Suffix
List: the PSL is ~10^4 rules and would ship as a broadcast lookup in
production; the heuristic here keeps the logic a pure column expression
a SQL oracle can replay bit-for-bit, and the suffix table is an
argument, so swapping in the full PSL is a data change, not a code
change. All-numeric hosts (IPv4 literals) are kept whole — their last
two dot-labels are not a domain.

Reference parity note: rdf-tabular resolves and normalizes IRIs per
RFC 3986 when emitting triples (rdf-tabular metadata.rb URI handling);
this module is the corpus-curation analog over free text, part of the
LLM-pipeline surface the engine adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..expr import let_

#: whole-match URL shape: scheme + everything up to whitespace/brackets.
#: Kept RE2-compatible (no lookaround) so the DuckDB oracle twin runs the
#: IDENTICAL pattern.
URL_PATTERN = "(?i)\\bhttps?://[^\\s<>\"']+"

#: sentence punctuation glued to a URL in running text is not part of it
TRAILING_PUNCT = "[.,;:!?)\\]]+$"

#: two-level public suffixes where the registered domain is LABEL.SUFFIX
#: (three labels), not the last two labels. Compact common subset; pass
#: the full PSL second-level set for production corpora.
PUBLIC_SUFFIX_2 = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.sg", "com.tr", "co.za", "com.ar",
)


def clean_url(url: Column) -> Column:
    """Strip sentence punctuation glued to the end of an extracted URL."""
    return F.regexp_replace(url, TRAILING_PUNCT, "")


def url_host(url: Column) -> Column:
    """Lowercased host of a URL: scheme and userinfo stripped, port/path/
    query/fragment cut, leading ``www.`` dropped. Pure anchored-regex
    projections — ``[^/@?#]*`` cannot cross a path/query/fragment
    delimiter, so an ``@`` later in the URL (path handle, query value)
    never masquerades as userinfo (RFC 3986: userinfo ends before the
    first ``/``, ``?`` or ``#``)."""
    s = F.regexp_replace(url, "(?i)^https?://", "")
    s = F.regexp_replace(s, "^[^/@?#]*@", "")
    host = F.lower(F.regexp_extract(s, "^[^/:?#]+", 0))
    return F.regexp_replace(host, "^www[.]", "")


def registered_domain(host: Column,
                      suffixes2: tuple[str, ...] = PUBLIC_SUFFIX_2) -> Column:
    """Registered (pay-level) domain of a host: last two dot-labels,
    or last three when the two-label tail is a public suffix (co.uk
    etc.). IPv4 literals and single-label hosts pass through whole.

    The *host* argument and the split label array are staged through
    :func:`~rdf_tabular_spark.expr.let_`: when the caller passes a
    composed expression (``registered_domain(url_host(u))`` inside a
    per-URL lambda — the blocklist path), interpreted HOF trees have no
    common-subexpression elimination, so every one of the ~10
    references here would otherwise re-run the whole host regex chain."""
    def on_labels(h: Column, labels: Column) -> Column:
        n = F.size(labels)
        dom2 = F.concat_ws(
            ".", F.element_at(labels, -2), F.element_at(labels, -1))
        dom3 = F.concat_ws(".", F.element_at(labels, -3), dom2)
        return (
            F.when(h.rlike("^[0-9.]+$") | (n < 2), h)
            .when((n >= 3) & dom2.isin(*suffixes2), dom3)
            .otherwise(dom2))

    return let_(host, lambda h: let_(F.split(h, "[.]"),
                                     lambda ls: on_labels(h, ls)))


def url_array(text: Column) -> Column:
    """All URLs in a text column, cleaned, as an array (map-only)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(URL_PATTERN), 0),
        clean_url)


def extract_urls(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """URL-grain rows (id, url, host, domain) — one per URL occurrence
    (documents without URLs contribute nothing). The only wide operation
    is the explode itself; host/domain are projections on the exploded
    short strings."""
    url = F.explode(url_array(F.col(text_col))).alias("url")
    out = docs.select(F.col(id_col), url)
    host = url_host(F.col("url"))
    return out.select(
        id_col, "url", host.alias("host"),
        registered_domain(host).alias("domain"))


def domain_mix(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per registered domain: URL occurrences and distinct citing docs.
    One map-side-combined aggregation; the Zipfian head (a hot domain)
    reaches its reducer as one partial per upstream partition."""
    pairs = extract_urls(docs, text_col, id_col)
    return pairs.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.count_distinct(id_col).alias("n_docs"))


def blocklist_filter(docs: DataFrame, blocked: list[str],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Drop every document citing at least one URL whose registered
    domain is in *blocked* (a driver-side list). Pure map-only per-row
    predicate — the right shape while the list fits in a task binary
    (10^2-10^4 domains, the usual curated blocklist size). For
    PSL-scale lists use :func:`blocklist_filter_join`."""
    domains = F.transform(url_array(F.col(text_col)),
                          lambda u: registered_domain(url_host(u)))
    hit = F.exists(domains, lambda d: d.isin(*blocked))
    return docs.filter(~F.coalesce(hit, F.lit(False)))


def blocklist_filter_join(docs: DataFrame, blocked: DataFrame,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Blocklist filter for large lists: the narrow (doc, domain) pairs
    semi-join the BROADCAST blocklist (column ``domain``), then the
    corpus anti-joins the tiny hit set on id — the corpus itself never
    shuffles, matching the decontamination join shape (ops/decon.py)."""
    pairs = extract_urls(docs, text_col, id_col).select(id_col, "domain")
    hits = pairs.join(F.broadcast(blocked.select("domain").distinct()),
                      "domain").select(id_col).distinct()
    return docs.join(hits, id_col, "left_anti")
