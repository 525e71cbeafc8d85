"""Heavy-basket cap laws for item_cooccurrence_pairs(max_basket) —
the round-7 fix for the last unbounded quadratic (per-user pair
emission). Three laws, each against a hypothesis-generated corpus
seeded with one adversarial hot user:

1. subset: capped pair keys ⊆ uncapped pair keys, and per-pair
   support n_common(capped) ≤ n_common(uncapped);
2. bound: the hot user contributes at most C(cap, 2) pairs — exact
   Python replay of the slice(sort_array, 1, cap) cut;
3. sizes invariance: item sizes (the cosine denominators) are
   identical capped vs uncapped — only pair GENERATION is capped.

Plus a determinism pin: the Spark cut equals the oracle's
row_number() OVER (ORDER BY item_id) <= cap cut (smallest item ids).
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings, strategies as st

_corpus = st.lists(
    st.tuples(st.integers(1, 6), st.integers(1, 30)),  # (user, item)
    min_size=1,
    max_size=60,
)


def _python_pairs(rows, cap):
    """Exact replay: per-user distinct items, keep the cap smallest,
    emit unordered pairs, count supporting users, keep support >= 1."""
    baskets = {}
    for u, i in rows:
        baskets.setdefault(u, set()).add(i)
    counts = {}
    for items in baskets.values():
        kept = sorted(items)[:cap] if cap is not None else sorted(items)
        for a, b in combinations(kept, 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return counts


@settings(max_examples=5, deadline=None)
@given(rows=_corpus, cap=st.integers(2, 6))
def test_cap_subset_support_and_replay(spark, rows, cap):
    from recmetrics_pyspark_spark.operators.metrics import (
        item_cooccurrence_pairs,
    )

    # one adversarial hot user whose basket dwarfs the cap
    hot = [(99, i) for i in range(100, 140)]
    df = spark.createDataFrame(rows + hot, ["person", "product"])

    capped_df, sizes_c = item_cooccurrence_pairs(
        df, min_common=1, max_basket=cap
    )
    uncapped_df, sizes_u = item_cooccurrence_pairs(
        df, min_common=1, max_basket=None
    )
    capped = {(r.ia, r.ib): r.n_common for r in capped_df.collect()}
    uncapped = {(r.ia, r.ib): r.n_common for r in uncapped_df.collect()}

    # law 1: subset + per-pair support dominance
    for k, n in capped.items():
        assert k in uncapped and n <= uncapped[k]

    # law 2 + determinism pin: exact Python replay of the sorted cut
    assert capped == _python_pairs(rows + hot, cap)
    assert uncapped == _python_pairs(rows + hot, None)

    # the hot user's contribution is bounded at C(cap, 2)
    hot_pairs = [k for k in capped if k[0] >= 100 and k[1] >= 100]
    assert len(hot_pairs) <= cap * (cap - 1) // 2
    # uncapped it was the full quadratic (the thing the cap bounds)
    assert len([k for k in uncapped if k[0] >= 100]) == 40 * 39 // 2

    # law 3: sizes (cosine denominators) are cap-invariant
    sc = {r.i: r.sz for r in sizes_c.collect()}
    su = {r.i: r.sz for r in sizes_u.collect()}
    assert sc == su


def test_default_is_exact_uncapped(spark):
    """The DEFAULT is exact reference semantics — no silent truncation
    (ADVICE r7): a basket larger than the old implicit 1000 cap emits
    every C(n, 2) pair unless a caller opts in to max_basket."""
    from recmetrics_pyspark_spark.operators.metrics import (
        item_cooccurrence_pairs,
    )

    n = 1005
    rows = [(1, i) for i in range(n)] + [(2, 3), (2, 4)]
    df = spark.createDataFrame(rows, ["person", "product"])
    dflt, _ = item_cooccurrence_pairs(df, min_common=1)
    # C(1005, 2) > C(1000, 2): the default did not slice the basket
    assert dflt.count() == n * (n - 1) // 2
    capped, _ = item_cooccurrence_pairs(df, min_common=1, max_basket=1000)
    assert capped.count() == 1000 * 999 // 2


# --- url_canonicalize laws (round 7) ---------------------------------

_url_strategy = st.builds(
    lambda scheme, www, host, port, path, slash, params, frag: (
        scheme
        + www
        + host
        + port
        + "/" + path
        + ("/" if slash else "")
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    scheme=st.sampled_from(["https://", "http://", "", "HTTPS://"]),
    www=st.sampled_from(["", "www.", "WWW.", "www.www."]),
    host=st.sampled_from(
        ["example.com", "Site7.CO.UK", "h.io", "a.b.c.org", "x.com.",
         ""]  # empty host: 'https:///x' must NOT key as host='https'
    ),
    port=st.sampled_from(["", ":443", ":80", ":8080"]),
    path=st.sampled_from(["p/1", "q", "", "deep/er/path"]),
    slash=st.booleans(),
    params=st.lists(
        st.sampled_from(
            ["a=1", "b=2", "utm_source=x", "gclid=9", "z", "ref=t",
             "UTM_SOURCE=y", "Gclid=8", "REF"]
        ),
        max_size=4,
        unique=True,
    ),
    frag=st.sampled_from(["", "#f", "#a/b?c"]),
)


def _py_canonicalize(url: str) -> str:
    """Exact Python replay of functions/curation.py::url_canonicalize
    (two-step: scheme strip FIRST, then parse — the combined pattern
    backtracked on empty-host URLs)."""
    import re

    sm = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", url)
    rest = url[sm.end():] if sm else url
    m = re.match(
        r"^(?:[^/?#]*@)?([^/:?#]*)(?::([0-9]+))?([^?#]*)(?:[?]([^#]*))?",
        rest,
    )
    g = ["" if (m is None or x is None) else x for x in (
        m.groups() if m else ("",) * 4
    )]
    scheme = (sm.group(1).lower() if sm else "") or "https"
    host = re.sub(r"^(www\.)+", "", g[0].lower().rstrip("."))
    port = g[1]
    if port and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    ):
        port_part = ":" + port
    else:
        port_part = ""
    path = re.sub(r"/+$", "", g[2])
    track = re.compile(
        r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_eid|igshid|ref"
        r"|ref_src|spm)(=|$)",
        re.IGNORECASE,
    )
    params = sorted(
        x for x in g[3].split("&") if x != "" and not track.match(x)
    )
    q_part = "?" + "&".join(params) if params else ""
    return scheme + "://" + host + port_part + path + q_part


@settings(max_examples=5, deadline=None)
@given(urls=st.lists(_url_strategy, min_size=1, max_size=12))
def test_url_canonicalize_replay_and_idempotent(spark, urls):
    import pyspark.sql.functions as F

    from recmetrics_pyspark_spark.functions.curation import (
        url_canonicalize,
    )

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    once = [
        r.c
        for r in df.select(
            url_canonicalize(F.col("url")).alias("c")
        ).collect()
    ]
    # exact Python replay
    assert once == [_py_canonicalize(u) for u in urls]
    # idempotence: canonical output is its own canonical form (the
    # dedup-key law — re-crawling a canonical URL must key identically)
    df2 = spark.createDataFrame([(c,) for c in once], ["url"])
    twice = [
        r.c
        for r in df2.select(
            url_canonicalize(F.col("url")).alias("c")
        ).collect()
    ]
    assert twice == once


def test_cap_cut_matches_duckdb_mirror_when_live(spark):
    """The oracle mirrors the cap as a row_number() ORDER BY item_id
    cut while Spark slices the sorted basket array. At driver SFs the
    cap never binds, so parity alone can't prove the two cuts agree —
    this runs BOTH engines on a corpus where the cap bites (a hot
    user over the cap) and compares the full pair tables."""
    import duckdb

    from recmetrics_pyspark_spark.operators.metrics import (
        item_cooccurrence_pairs,
    )

    rows = [(u, i) for u in (1, 2) for i in range(u, u + 4)]
    rows += [(9, i) for i in range(100, 120)]  # hot: 20 items, cap 5
    df = spark.createDataFrame(rows, ["person", "product"])
    got, _ = item_cooccurrence_pairs(df, min_common=1, max_basket=5)
    got = sorted(map(tuple, got.select("ia", "ib", "n_common").collect()))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE upairs AS SELECT * FROM (VALUES "
        + ",".join(f"({u},{i})" for u, i in rows)
        + ") t(user_id, item_id)"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                """
WITH bcapped AS (
  SELECT user_id, item_id FROM (
    SELECT user_id, item_id,
      row_number() OVER (PARTITION BY user_id ORDER BY item_id) AS brk
    FROM upairs) t
  WHERE brk <= 5
)
SELECT a.item_id AS ia, b.item_id AS ib, count(*) AS n_common
FROM bcapped a JOIN bcapped b ON a.user_id = b.user_id
  AND a.item_id < b.item_id
GROUP BY a.item_id, b.item_id
"""
            ).fetchall(),
        )
    )
    assert got == want
    # and the cut actually bit: the hot user contributes C(5,2)=10
    hot = [p for p in got if p[0] >= 100]
    assert len(hot) == 10
