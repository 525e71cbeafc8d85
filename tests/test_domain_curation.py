"""Domain-grain curation: registrable-domain extraction, per-domain
caps, and domain-mix stats (functions/curation.py round-6 additions).

Hand-computed fixtures; the sf-scale DuckDB parity rides
test_oracle_parity.py like every other query.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from recmetrics_pyspark_spark.functions.curation import (
    domain_cap_sample,
    domain_mix_stats,
    registrable_domain,
)


def _extract(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r.d
        for r in df.select(
            registrable_domain(F.col("url")).alias("d")
        ).collect()
    ]


def test_registrable_domain_cases(spark):
    cases = {
        "https://news.bbc.co.uk/world": "bbc.co.uk",
        "http://example.com": "example.com",
        "https://a.b.example.com.au:8080/q?x=1": "example.com.au",
        "sub.example.org/path": "example.org",  # scheme-less
        "https://WWW.Example.COM/Upper": "example.com",
        "https://localhost/x": "localhost",  # single label
        "ftp://deep.sub.tree.example.co.jp/f": "example.co.jp",
        "https://plain.io": "plain.io",
        # userinfo is stripped, not mistaken for the host
        "https://user:pw@example.com/x": "example.com",
        "https://bob@mail.example.co.uk/inbox": "example.co.uk",
        "alice@ftp.example.org/f": "example.org",  # scheme-less + userinfo
        # legal trailing-dot FQDNs key with their real domain — the
        # empty last label must not eat the TLD and collapse every
        # *.com. host into 'com.'
        "https://example.com./x": "example.com",
        "https://news.bbc.co.uk.:443/w": "bbc.co.uk",
        "http://dotted.example.org...": "example.org",
    }
    got = _extract(spark, list(cases))
    assert got == list(cases.values())


def test_registrable_domain_ipv6_is_opaque_not_colliding(spark):
    # bracketed IPv6 hosts are a documented limitation: no dots, so
    # they fall through as '['-prefixed opaque keys that can never
    # collide with a real registrable domain
    got = _extract(
        spark, ["https://[2001:db8::1]:8080/x", "https://example.com/x"]
    )
    assert got[1] == "example.com"
    assert got[0].startswith("[")
    assert "." not in got[0]


def test_domain_cap_sample_cap_and_determinism(spark):
    # domain a: 5 docs, domain b: 2 docs; cap 3
    rows = [(i, f"https://{'a' if i < 5 else 'b'}.com/p/{i}") for i in range(7)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = domain_cap_sample(df, "url", "doc_id", max_per_domain=3).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    assert set(by_dom) == {"a.com", "b.com"}
    assert len(by_dom["a.com"]) == 3  # capped from 5
    assert len(by_dom["b.com"]) == 2  # under cap: passes through
    assert sorted(r.keep_rank for r in by_dom["a.com"]) == [1, 2, 3]

    # the kept a.com ids are the 3 smallest md5(domain:id) hashes —
    # recompute driver-side with the same 15-hex-digit rule
    def h(dom, i):
        return int(hashlib.md5(f"{dom}:{i}".encode()).hexdigest()[:15], 16)

    expect = sorted(range(5), key=lambda i: (h("a.com", i), i))[:3]
    kept = sorted(r.doc_id for r in by_dom["a.com"])
    assert kept == sorted(expect)

    # deterministic: a second run returns the same row SET (the
    # operator is unordered by design — no global output sort)
    again = domain_cap_sample(
        df, "url", "doc_id", max_per_domain=3
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_domain_cap_sample_plans_window_group_limit(spark):
    """The scale claim in the docstring: rank ≤ cap plans as
    WindowGroupLimit, truncating map-side groups BEFORE the exchange
    (partial mode) so a hot domain never ships its full row set."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://s"), (F.col("id") % 3).cast("string"),
            F.lit(".com/p"),
        ).alias("url"),
    )
    plan = (
        domain_cap_sample(df, "url", "doc_id", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def test_domain_mix_stats_shares_and_residual(spark):
    # 4 domains: sizes 5, 3, 2, 1 (11 docs); top_k=2 → (other) holds 3
    rows = []
    sizes = {"big.com": 5, "mid.com": 3, "sml.com": 2, "one.com": 1}
    i = 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"https://{dom}/p/{i}", 10 * (i + 1)))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    out = domain_mix_stats(df, "url", "n_chars", top_k=2).collect()
    assert [r.domain for r in out] == ["big.com", "mid.com", "(other)"]
    assert [r.rnk for r in out] == [1, 2, 3]
    assert [r.n_docs for r in out] == [5, 3, 3]
    total_w = sum(10 * (j + 1) for j in range(11))
    assert sum(r.weight for r in out) == total_w
    assert abs(out[0].doc_share - round(5 / 11, 6)) < 1e-9
    assert abs(out[1].cum_doc_share - round(8 / 11, 6)) < 1e-9
    assert out[-1].cum_doc_share == 1.0  # residual closes the report


def test_domain_mix_stats_no_residual_when_topk_covers(spark):
    rows = [(i, f"https://d{i % 2}.com/x", 7) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    out = domain_mix_stats(df, "url", "n_chars", top_k=5).collect()
    assert len(out) == 2  # no (other) row when the tail is empty
    assert {r.domain for r in out} == {"d0.com", "d1.com"}
    assert out[-1].cum_doc_share == 1.0


def test_url_canonicalize_cases(spark):
    from recmetrics_pyspark_spark.functions.curation import (
        url_canonicalize,
    )

    cases = {
        # tracking params dropped, survivors sorted, www/port/frag/
        # trailing-slash/userinfo noise removed, case folded
        "https://www.Example.COM:443/p/1/?b=2&utm_source=x&a=1#f":
            "https://example.com/p/1?a=1&b=2",
        "http://example.com:80/p/1?a=1&b=2":
            "http://example.com/p/1?a=1&b=2",  # http kept, :80 elided
        "https://example.com./p/1?a=1&b=2":
            "https://example.com/p/1?a=1&b=2",
        "example.com/p/1?a=1&b=2":  # scheme-less -> https
            "https://example.com/p/1?a=1&b=2",
        "https://user:pw@example.com/p/1":
            "https://example.com/p/1",
        "https://site.co.uk/": "https://site.co.uk",
        "http://h.io:8080/x?utm_campaign": "http://h.io:8080/x",
        "https://a.io/x?gclid=1&fbclid=2&ref=z": "https://a.io/x",
        # param names keep their case outside host/scheme, so the drop
        # list must be case-insensitive (ADVICE r7)
        "https://a.io/x?UTM_SOURCE=1&Gclid=9&REF": "https://a.io/x",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = [
        r.c
        for r in df.select(
            url_canonicalize(F.col("url")).alias("c")
        ).collect()
    ]
    assert got == list(cases.values())


def test_canonical_url_dups_groups(spark):
    from recmetrics_pyspark_spark.functions.curation import (
        canonical_url_dups,
    )

    rows = [
        (1, "https://www.a.com/p?utm_source=x&k=1"),
        (2, "https://a.com:443/p?k=1"),
        (3, "https://a.com/p?k=1#frag"),
        (4, "https://a.com/q"),  # singleton: filtered by min_variants
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = canonical_url_dups(df, "doc_id", "url").collect()
    assert len(out) == 1
    r = out[0]
    assert r.canonical_url == "https://a.com/p?k=1"
    assert (r.n_variants, r.min_doc_id, r.max_doc_id) == (3, 1, 3)


def test_domain_neardup_rates_within_domain_only(spark):
    from recmetrics_pyspark_spark.functions.curation import (
        domain_neardup_rates,
    )

    same = "alpha beta gamma delta epsilon zeta"
    rows = [
        # a.com: two exact-text docs -> one within-domain pair
        (1, same, "https://a.com/1"),
        (2, same, "https://sub.a.com/2"),  # subdomain, same domain
        # b.com: one doc duplicating a.com's text (cross-domain pairs
        # (1,3)/(2,3) must NOT count) and one unrelated doc
        (3, same, "https://b.com/3"),
        (4, "one two three four five six", "https://b.com/4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "url"])
    out = {r.domain: r for r in domain_neardup_rates(df).collect()}
    assert out["a.com"].n_docs == 2
    assert out["a.com"].n_neardup_pairs == 1
    assert out["a.com"].n_dup_docs == 2
    assert out["a.com"].dup_doc_share == 1.0
    assert out["b.com"].n_docs == 2
    assert out["b.com"].n_neardup_pairs == 0  # cross-domain excluded
    assert out["b.com"].n_dup_docs == 0
    assert out["b.com"].dup_doc_share == 0.0


def test_url_parse_no_scheme_word_as_host(spark):
    """Backtracking regression (round-7 review): an empty-host URL
    must not capture the scheme word as its host/domain."""
    from recmetrics_pyspark_spark.functions.curation import (
        url_canonicalize,
    )

    cases = {
        "https:///x": "https:///x",            # empty host, idempotent
        "file:///etc/passwd": "file:///etc/passwd",  # host '', not 'file'
        "https://./x": "https:///x",           # dot-host strips to ''
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = [
        r.c
        for r in df.select(
            url_canonicalize(F.col("url")).alias("c")
        ).collect()
    ]
    assert got == list(cases.values())
    # and the registrable domain of an empty-host URL is '', never
    # the scheme word
    assert _extract(spark, ["https:///x", "file:///e"]) == ["", ""]
