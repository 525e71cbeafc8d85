"""Reference API-surface parity: same names, signatures, and return
contracts as camiloakv/recmetrics-pyspark (reference README.md:23-32),
checked on the reference's own fixtures."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from recmetrics_pyspark_spark import compat
from tests.test_metrics_golden import NB64_POPS, NB64_PREDS, _nb64_frames


def test_coverage_signature_and_value(spark):
    recs = spark.createDataFrame([(1, 10), (2, 11)], ["u", "id_product"])
    ratings = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 12), (4, 13)], ["u", "id_product"]
    )
    assert compat.coverage(recs, ratings) == pytest.approx(0.5)


def test_novelty_returns_tuple_ordered_by_user(spark):
    sales, recs = _nb64_frames(spark)
    nov, msis = compat.novelty(sales, recs, u=10)
    assert len(msis) == 4
    # order contract: msis[i] is user i's MSI (reference :168)
    expect0 = sum(-math.log2(NB64_POPS[i] / 10) for i in NB64_PREDS[0]) / 3
    assert msis[0] == pytest.approx(expect0, abs=1e-9)
    assert nov == pytest.approx(sum(msis) / 4, abs=1e-9)


def test_novelty_refac_fixed_n_division():
    nov, msis = compat.novelty_refac(NB64_PREDS, NB64_POPS, u=10, n=3)
    # all reference lists have length 3, so refac == per-user division here
    expect0 = sum(-math.log2(NB64_POPS[i] / 10) for i in NB64_PREDS[0]) / 3
    assert msis[0] == pytest.approx(expect0)
    # but with n=6 the quirk shows: every MSI halves
    nov6, msis6 = compat.novelty_refac(NB64_PREDS, NB64_POPS, u=10, n=6)
    assert msis6[0] == pytest.approx(expect0 / 2)


def test_novelty_pandas_twin(spark):
    sales = pd.DataFrame(
        [(u, i) for i, p in NB64_POPS.items() for u in range(p)],
        columns=["person", "product"],
    )
    recs = pd.DataFrame(
        [(u, i) for u, items in enumerate(NB64_PREDS) for i in items],
        columns=["person", "product"],
    )
    nov_p, msis_p = compat.novelty_pandas(sales, recs, u=10)
    sdf_sales, sdf_recs = _nb64_frames(spark)
    nov_s, msis_s = compat.novelty(sdf_sales, sdf_recs, u=10)
    assert nov_p == pytest.approx(nov_s)
    assert msis_p == pytest.approx(msis_s)


@pytest.mark.parametrize("version", [0, 1, 2])
def test_personalization_all_versions_agree(spark, version):
    # reference :310-312: "All three version return the same value"
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 2), (2, 1), (3, 3), (3, 4)],
        ["cod_pessoa", "cod_ean"],
    )
    got = compat.personalization(df, "cod_pessoa", "cod_ean", version=version)
    assert got == pytest.approx(2 / 3, abs=1e-6)


def test_personalization_pandas_weighted(spark):
    # two identical users -> cosine 1 regardless of weights -> P = 0
    df = pd.DataFrame(
        {"person": [1, 1, 2, 2], "product": [1, 2, 1, 2],
         "rating": [2.0, 3.0, 2.0, 3.0]}
    )
    got = compat.personalization_pandas(
        df, "person", "product", col_values="rating"
    )
    assert got == pytest.approx(0.0, abs=1e-9)
    # orthogonal users -> P = 1
    df2 = pd.DataFrame(
        {"person": [1, 2], "product": [1, 2], "rating": [5.0, 1.0]}
    )
    assert compat.personalization_pandas(
        df2, "person", "product", col_values="rating"
    ) == pytest.approx(1.0)


def test_intra_list_similarities_series_contract(spark):
    df = pd.DataFrame(
        {
            "person": [1, 1, 2, 2],
            "product": ["A", "B", "C", "D"],
            "category": ["x", "x", "x", "y"],
            "rating": [1.0, 1.0, 2.0, 3.0],
        }
    )
    s = compat.intra_list_similarities(df)
    assert s.name == "intra_list_similarity"
    assert s.loc[1] == pytest.approx(1.0)  # same category -> cos 1
    assert s.loc[2] == pytest.approx(0.0)


def test_long_tail_plot_returns_stats_without_matplotlib(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], ["id_product"])
    out = compat.long_tail_plot(df)
    assert list(out["item_rank"]) == [1, 2]
    assert out.iloc[0]["volume"] == 2


def test_matrix_scaffolding_names_resolve():
    import recmetrics_pyspark as rp

    for name in (
        "cosine_similarity_matrix",
        "vertical_vector",
        "get_symmetrical_matrix_mean",
        "get_upper_triangle_mean",
        "get_similarities_from_stacked",
    ):
        assert callable(getattr(rp, name))


def test_gram_pipeline_agrees_with_personalization(spark):
    # the reference's matrix pipeline (pivot -> Gram -> 1 - mean
    # off-diagonal) must reproduce the self-join personalization value
    rows = [(1, 1), (1, 2), (2, 2), (2, 1), (3, 3), (3, 4)]
    df = spark.createDataFrame(rows, ["person", "product"])
    expected = compat.personalization(df)
    pivot = (
        df.groupBy("person")
        .pivot("product", [1, 2, 3, 4])
        .count()
        .fillna(0)
    )
    sims = compat.cosine_similarity_matrix(
        pivot, ["1", "2", "3", "4"], index_col="person"
    )
    got = 1.0 - compat.get_symmetrical_matrix_mean(sims)
    # personalization rounds to 6 decimals; the Gram path is exact
    assert got == pytest.approx(expected, abs=1e-6)


def test_pandas_stacked_pipeline_agrees(spark):
    dfp = pd.DataFrame(
        {"person": [1, 1, 2, 2, 3, 3], "product": [1, 2, 2, 1, 3, 4]}
    )
    sims = compat.get_similarities_from_stacked(dfp)
    assert sims.shape == (3, 3)
    got = compat.get_upper_triangle_mean(sims.to_numpy())
    sdf = spark.createDataFrame(dfp, ["person", "product"])
    assert got == pytest.approx(compat.personalization(sdf), abs=1e-6)


def test_vertical_vector_shape(spark):
    vv = compat.vertical_vector(5, 1.0)
    assert vv.count() == 5
    assert vv.agg(compat.F.sum("value")).head()[0] == pytest.approx(5.0)
