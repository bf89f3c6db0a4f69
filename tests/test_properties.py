"""Property-based tests (hypothesis) for the engine's contract-bearing
operators.  Each property batches its generated examples into ONE
DataFrame so a hypothesis run costs one Spark job, not one per example."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.functions.cleaning import clean_text
from proyecto_gasto_publico_etl_per__spark.operators.star import upsert_dim

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

text_strategy = st.lists(
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no surrogates (invalid UTF-8)
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(texts=text_strategy)
def test_clean_text_is_idempotent(spark, texts):
    """PRJ5 contract: cleaning is a projection — applying it twice equals
    applying it once (NULL→''→strip→collapse-whitespace stabilizes)."""
    df = spark.createDataFrame([(t,) for t in texts], "t STRING")
    out = df.select(
        clean_text("t").alias("once"),
        clean_text(clean_text("t")).alias("twice"),
    ).collect()
    for r in out:
        assert r.once == r.twice


@SETTINGS
@given(
    ints=st.lists(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        min_size=1, max_size=25,
    ),
    junk=st.lists(
        st.text(
            alphabet="abcXYZ!@# .",  # never a parseable int
            min_size=1, max_size=10,
        ),
        min_size=1, max_size=10,
    ),
)
def test_try_cast_keeps_ints_nulls_junk(spark, ints, junk):
    """PRJ4 contract (`to_numeric(errors="coerce")`): every integer
    round-trips through string→int; every non-numeric string becomes
    NULL, never an error."""
    rows = [(str(i), True) for i in ints] + [(j, False) for j in junk]
    df = spark.createDataFrame(rows, "s STRING, numeric BOOLEAN")
    out = df.select("s", "numeric", F.col("s").try_cast("int").alias("v")).collect()
    for r in out:
        if r.numeric:
            assert r.v == int(r.s)
        else:
            assert r.v is None


@SETTINGS
@given(
    existing_keys=st.lists(
        st.integers(min_value=0, max_value=20), min_size=0, max_size=15
    ),
    incoming_keys=st.lists(
        st.integers(min_value=0, max_value=20), min_size=1, max_size=15
    ),
)
def test_upsert_dim_union_semantics_and_idempotency(
    spark, existing_keys, incoming_keys
):
    """SNK3 contract: after an upsert the dim holds exactly the union of
    key sets, each key once; re-upserting the same batch changes nothing
    (ON CONFLICT DO NOTHING)."""
    existing = (
        spark.createDataFrame([(k,) for k in set(existing_keys)], "k INT")
        if existing_keys
        else None
    )
    incoming = spark.createDataFrame([(k,) for k in incoming_keys], "k INT")
    once = upsert_dim(existing, incoming, ["k"])
    got = sorted(r.k for r in once.collect())
    assert got == sorted(set(existing_keys) | set(incoming_keys))
    twice = upsert_dim(once, incoming, ["k"])
    assert sorted(r.k for r in twice.collect()) == got
