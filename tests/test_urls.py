"""URL extraction / domain curation (ops/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_tabular_spark.ops import urls


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string")


def _one_host(spark, url):
    row = urls.extract_urls(_docs(spark, [f"x {url} y"])).collect()
    assert len(row) == 1, row
    return row[0]


def test_host_parsing_corners(spark):
    cases = {
        "https://www.Example.co.uk/a/b?q=1": ("example.co.uk", "example.co.uk"),
        "http://user:pw@secure.site.org:8080/x#f": ("secure.site.org", "site.org"),
        "HTTPS://CDN.static.badsite.com/img.png": ("cdn.static.badsite.com", "badsite.com"),
        "http://192.168.10.1:8080/admin": ("192.168.10.1", "192.168.10.1"),
        "http://localhost/x": ("localhost", "localhost"),
        "http://a.b.c.d.example.com": ("a.b.c.d.example.com", "example.com"),
        # path '@' after the first '/' is NOT userinfo
        "https://wiki.info/page/@handle": ("wiki.info", "wiki.info"),
        # '@' inside a query/fragment BEFORE any '/' is not userinfo
        # either (review r3: userinfo ends at the first /, ? or #)
        "http://example.com?u=a@b": ("example.com", "example.com"),
        "http://badsite.com#a@b": ("badsite.com", "badsite.com"),
    }
    for url, (host, domain) in cases.items():
        r = _one_host(spark, url)
        assert (r["host"], r["domain"]) == (host, domain), (url, r)


def test_trailing_punctuation_stripped(spark):
    rows = urls.extract_urls(_docs(spark, [
        "see https://spam.co.uk/page]. or http://papers.net/a.tar.gz, done",
    ])).collect()
    got = sorted(r["url"] for r in rows)
    assert got == ["http://papers.net/a.tar.gz", "https://spam.co.uk/page"]


def test_no_url_docs_contribute_nothing(spark):
    docs = _docs(spark, ["no links here", "https://docs.dev/x ok"])
    assert urls.extract_urls(docs).count() == 1


def test_blocklist_filter_map_only_and_join_agree(spark):
    docs = _docs(spark, [
        "clean https://docs.dev/x",
        "dirty https://api.badsite.com/t plus https://docs.dev/y",
        "no links at all",
        "blocked-only http://spam.co.uk",
    ])
    kept = urls.blocklist_filter(docs, ["badsite.com", "spam.co.uk"])
    assert sorted(r["doc_id"] for r in kept.collect()) == ["d0", "d2"]
    blocked_df = spark.createDataFrame(
        [("badsite.com",), ("spam.co.uk",)], "domain string")
    kept2 = urls.blocklist_filter_join(docs, blocked_df)
    assert sorted(r["doc_id"] for r in kept2.collect()) == ["d0", "d2"]
    # the list path is a pure per-row predicate: no exchange in the plan
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_domain_mix_counts(spark):
    docs = _docs(spark, [
        "https://a.docs.dev/1 https://www.docs.dev/2",
        "https://docs.dev/3",
        "http://papers.net/x",
    ])
    mix = {r["domain"]: (r["n_urls"], r["n_docs"])
           for r in urls.domain_mix(docs).collect()}
    assert mix == {"docs.dev": (3, 2), "papers.net": (1, 1)}


def test_host_parse_matches_urllib_on_generated_corpus(spark):
    """Independent-implementation parity: the anchored-regex host chain
    must agree with stdlib urllib.parse (a parser, not a regex) on a
    deterministic corpus spanning userinfo/ports/paths-with-@/queries/
    fragments/case."""
    import hashlib
    from urllib.parse import urlsplit

    def h(tag, i):
        return int(hashlib.md5(f"{tag}|{i}".encode()).hexdigest()[:8], 16)

    schemes = ["http://", "https://", "HTTP://", "hTTps://"]
    users = ["", "bob@", "user:p-w@"]
    hosts = ["example.com", "WWW.Example.co.uk", "a.b.c.site.org",
             "api.dataset.io", "192.168.1.9", "localhost", "x-y.z.net"]
    ports = ["", ":80", ":8443"]
    tails = ["", "/", "/p/q", "/u/@handle", "/q?a=1&b=:2", "/x#f:rag",
             "/a@b/c"]
    corpus = [schemes[h("s", i) % 4] + users[h("u", i) % 3]
              + hosts[h("h", i) % 7] + ports[h("p", i) % 3]
              + tails[h("t", i) % 7]
              for i in range(300)]
    got = {r["url"]: r["host"] for r in urls.extract_urls(
        _docs(spark, [f"x {u} y" for u in corpus])).collect()}
    assert len(got) == len(set(corpus))
    for u in corpus:
        expect = urlsplit(u).hostname
        if expect.startswith("www."):
            expect = expect[4:]
        assert got[u] == expect, (u, got[u], expect)
