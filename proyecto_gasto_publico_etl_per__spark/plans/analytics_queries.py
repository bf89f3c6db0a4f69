"""Round-5 analytics extensions: data-quality auditing, corpus statistics,
and fuzzy-matching queries (all oracle-backed).

Same registry/oracle conventions as extension_queries:

- every float that reaches the result is either ONE exact-integer division
  cast to DOUBLE (bit-identical in any engine) or an explicitly mirrored
  IEEE expression chain (identical op order in Spark and DuckDB),
- log-based statistics (entropy, Zipf) are quantized to integer micro
  grids PER TERM before any summation, so the aggregate is an exact
  BIGINT sum and never depends on floating-point addition order,
- hashing is md5-prefix (portable), ties always broken by a total order.

These queries extend the training-data-pipeline surface with the audit /
reporting layer a corpus build needs around the core dedup/curation ops:
rule-based data-quality gates, per-column profiling, fuzzy entity
resolution, collocation mining, redundancy economics, and rolling reach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup, textstats
from ..operators.dedup import _tokens
from ..operators.skew import pin
from ..sources.tables import fan_out, load_table
from .driver_queries import register
from .extension_queries import _DOCS_CTE, JACCARD_T, _lang_sql

#: cross-doc repeated-window threshold: a 3-token line seen in ≥ this many
#: distinct docs is treated as boilerplate (CCNet/RefinedWeb-style
#: line-level dedup; tuned so the synthetic corpus has a real boiler set)
BOILER_DF = 3

#: blocked edit-distance verify: prefix length bound + distance threshold
EDIT_PREFIX = 120
EDIT_T = 30

#: containment (subset-duplicate) gates
CONTAIN_T = 0.8
CONTAIN_MIN_SH = 10


# --- data-quality auditing ---------------------------------------------------


@register(
    "dq_rule_violations",
    """
    WITH li AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS neg_price,
             sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
               AS bad_qty,
             sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
               AS bad_disc,
             sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS neg_tax
      FROM lineitem
    ),
    o AS (
      SELECT count(*) AS n,
             sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS null_date,
             sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS neg_total
      FROM orders
    ),
    orphan AS (
      SELECT count(*) AS v FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    ),
    childless AS (
      SELECT count(*) AS v FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    ),
    early_ship AS (
      SELECT count(*) AS v, (SELECT count(*) FROM lineitem) AS n
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate < o.o_orderdate
    ),
    rules AS (
      SELECT 'lineitem_negative_price' AS rule, neg_price AS n_violations,
             n AS n_checked FROM li
      UNION ALL SELECT 'lineitem_quantity_out_of_range', bad_qty, n FROM li
      UNION ALL SELECT 'lineitem_discount_out_of_range', bad_disc, n FROM li
      UNION ALL SELECT 'lineitem_negative_tax', neg_tax, n FROM li
      UNION ALL SELECT 'orders_null_orderdate', null_date, n FROM o
      UNION ALL SELECT 'orders_nonpositive_totalprice', neg_total, n FROM o
      UNION ALL SELECT 'lineitem_orphan_orderkey', v,
                       (SELECT count(*) FROM lineitem) FROM orphan
      UNION ALL SELECT 'orders_without_lineitems', v,
                       (SELECT count(*) FROM orders) FROM childless
      UNION ALL SELECT 'lineitem_shipped_before_order', v, n FROM early_ship
    )
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_checked AS BIGINT) AS n_checked,
           CASE WHEN n_checked > 0
                THEN CAST(n_violations AS DOUBLE) / CAST(n_checked AS DOUBLE)
                ELSE 0 END AS violation_rate
    FROM rules
    """,
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rulebook over the fact tables: row-local
    range/null rules in ONE conditional-aggregate scan per table (never a
    scan per rule), plus three referential rules (orphan FK both
    directions, ship-before-order) as key-joins.

    Scale: the row-local block is a map-side partial aggregate — 100 TB
    costs one scan.  The referential rules shuffle on the join key once
    each; at warehouse scale they would share one bucketed layout with
    every other orderkey join.  Output is a fixed 9-row report.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    def one(x):
        return F.sum(F.when(x, 1).otherwise(0)).cast("long")

    li_agg = li.agg(
        F.count("*").alias("n"),
        one(F.col("l_extendedprice") <= 0).alias("neg_price"),
        one((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "bad_qty"
        ),
        one((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "bad_disc"
        ),
        one(F.col("l_tax") < 0).alias("neg_tax"),
    )
    o_agg = o.agg(
        F.count("*").alias("n"),
        one(F.col("o_orderdate").isNull()).alias("null_date"),
        one(F.col("o_totalprice") <= 0).alias("neg_total"),
    )
    # referential rules carry their denominator via a broadcast scalar
    # aggregate (1 row) — never a driver-side .count() round-trip
    n_li = li.agg(F.count("*").alias("n"))
    n_o = o.agg(F.count("*").alias("n"))
    orphan = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("v"))
        .crossJoin(F.broadcast(n_li))
    )
    childless = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti")
        .agg(F.count("*").alias("v"))
        .crossJoin(F.broadcast(n_o))
    )
    early = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count("*").alias("v"))
        .crossJoin(F.broadcast(n_li))
    )

    def row(src, rule, vcol):
        return src.select(
            F.lit(rule).alias("rule"),
            F.col(vcol).cast("long").alias("n_violations"),
            F.col("n").cast("long").alias("n_checked"),
        )

    out = (
        row(li_agg, "lineitem_negative_price", "neg_price")
        .unionByName(row(li_agg, "lineitem_quantity_out_of_range", "bad_qty"))
        .unionByName(row(li_agg, "lineitem_discount_out_of_range", "bad_disc"))
        .unionByName(row(li_agg, "lineitem_negative_tax", "neg_tax"))
        .unionByName(row(o_agg, "orders_null_orderdate", "null_date"))
        .unionByName(row(o_agg, "orders_nonpositive_totalprice", "neg_total"))
        .unionByName(row(orphan, "lineitem_orphan_orderkey", "v"))
        .unionByName(row(childless, "orders_without_lineitems", "v"))
        .unionByName(row(early, "lineitem_shipped_before_order", "v"))
    )
    return out.withColumn(
        "violation_rate",
        F.when(
            F.col("n_checked") > 0,
            F.col("n_violations").cast("double")
            / F.col("n_checked").cast("double"),
        ).otherwise(F.lit(0.0)),
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@register(
    "table_profile",
    " UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) AS null_frac
        FROM orders
        """
        for c in _PROFILE_COLS
    ),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of a table (null count, exact distinct count,
    null fraction) — the metadata-completeness report a catalog crawler
    publishes per snapshot.

    ONE scan: all per-column null counts are conditional sums and the
    distinct counts ride the same aggregate (Spark expands multi-distinct
    into one Expand+Aggregate — a single pass producing ``n_cols``
    streams, not ``n_cols`` scans).  Scale note: exact multi-distinct
    Expand multiplies shuffle rows by the column count; at 100 TB the
    profile would switch the distinct counts to ``approx_count_distinct``
    (HLL) and keep this exact form for audit samples — documented here
    because the ORACLE must stay exact.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    wide = o.agg(*aggs)
    stack_args = []
    for c in _PROFILE_COLS:
        stack_args.extend(
            [F.lit(c), F.col(f"nulls_{c}"), F.col(f"dist_{c}")]
        )
    out = wide.select(
        F.col("n_rows"),
        F.stack(
            F.lit(len(_PROFILE_COLS)).cast("int"), *stack_args
        ).alias("column_name", "n_nulls", "n_distinct"),
    )
    return out.select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        (
            F.col("n_nulls").cast("double") / F.col("n_rows").cast("double")
        ).alias("null_frac"),
    )


# --- fuzzy matching ----------------------------------------------------------


@register(
    "editdist_neardup",
    rf"""
    WITH {_DOCS_CTE},
    blk AS (
      SELECT doc, clean, toks[1] || ' ' || toks[2] AS k
      FROM toks WHERE len(toks) >= 2
    )
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(levenshtein(substr(a.clean, 1, {EDIT_PREFIX}),
                            substr(b.clean, 1, {EDIT_PREFIX})) AS INT)
             AS edit_dist
    FROM blk a JOIN blk b ON a.k = b.k AND a.doc < b.doc
    WHERE levenshtein(substr(a.clean, 1, {EDIT_PREFIX}),
                      substr(b.clean, 1, {EDIT_PREFIX})) <= {EDIT_T}
    """,
)
def editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-blocked edit-distance near-dup verify: candidate pairs from
    a cheap equi-join block (first two normalized tokens), then exact
    Levenshtein over a BOUNDED prefix (O(P²) per pair, P=120) — the
    sorted-neighborhood / blocking shape of classic entity resolution.

    Scale: the only shuffle is the equi-join on the block key; distance
    is never computed outside a block, and the prefix bound caps per-pair
    cost regardless of document length.  Skewed blocks (a very common
    2-token prefix) are the hazard — the remedy is widening the block key
    (3 tokens) or salting, same playbook as the posting-join dedup.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = _tokens("text")
    base = docs.select(
        F.col("doc_id").alias("doc"),
        F.lower(F.trim(F.regexp_replace(F.coalesce("text", F.lit("")), r"\s+", " "))).alias("clean"),
        toks.alias("toks"),
    ).where(F.size("toks") >= 2)
    blk = base.select(
        "doc",
        "clean",
        F.concat(
            F.element_at("toks", 1), F.lit(" "), F.element_at("toks", 2)
        ).alias("k"),
    )
    a = blk.select(
        F.col("doc").alias("doc_a"), F.col("clean").alias("ca"), "k"
    )
    b = blk.select(
        F.col("doc").alias("doc_b"), F.col("clean").alias("cb"), "k"
    )
    return (
        a.join(b, "k")
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "edit_dist",
            F.levenshtein(
                F.substring("ca", 1, EDIT_PREFIX),
                F.substring("cb", 1, EDIT_PREFIX),
            ).cast("int"),
        )
        .where(F.col("edit_dist") <= EDIT_T)
        .select("doc_a", "doc_b", "edit_dist")
    )


@register(
    "fuzzy_dim_match",
    """
    WITH s AS (
      SELECT s_suppkey, s_name, s_nationkey, length(s_name) AS ln
      FROM supplier
    )
    SELECT a.s_nationkey AS nationkey,
           a.s_suppkey AS suppkey_a, b.s_suppkey AS suppkey_b,
           a.s_name AS name_a, b.s_name AS name_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS edit_dist
    FROM s a JOIN s b
      ON a.s_nationkey = b.s_nationkey AND a.ln = b.ln
     AND a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 2
    """,
)
def fuzzy_dim_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dimension-label duplicate candidates: supplier names within
    edit distance ≤ 2, blocked by (nation, name length) — the MEF-dim
    use case is near-identical ejecutora labels from inconsistent manual
    entry (reference dims are TRIM-normalized only,
    cargar_postgres.py:120-123; this adds the fuzzy layer a steward
    reviews before merging labels).

    Scale: dims are small by definition — the block join broadcasts; the
    length-equality block bounds Levenshtein's cost and prunes most
    pairs before it runs.
    """
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", F.length("s_name").alias("ln")
    )
    a = s.select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_suppkey").alias("suppkey_a"),
        F.col("s_name").alias("name_a"),
        "ln",
    )
    b = s.select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_suppkey").alias("suppkey_b"),
        F.col("s_name").alias("name_b"),
        "ln",
    )
    return (
        a.join(F.broadcast(b), ["nationkey", "ln"])
        .where(F.col("suppkey_a") < F.col("suppkey_b"))
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("int")
        )
        .where(F.col("edit_dist") <= 2)
        .select(
            "nationkey",
            "suppkey_a",
            "suppkey_b",
            "name_a",
            "name_b",
            "edit_dist",
        )
    )


# --- corpus statistics -------------------------------------------------------


@register(
    "pmi_bigram_lift",
    rf"""
    WITH {_DOCS_CTE},
    uni AS (
      SELECT unnest(toks) AS tok FROM toks
    ),
    ucnt AS (SELECT tok, count(*) AS n FROM uni GROUP BY tok),
    utot AS (SELECT sum(n) AS n_uni FROM ucnt),
    bi AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM toks WHERE len(toks) >= 2
    ),
    bcnt AS (SELECT bigram, count(*) AS n_ab FROM bi GROUP BY bigram),
    btot AS (SELECT sum(n_ab) AS n_bi FROM bcnt),
    lift AS (
      SELECT b.bigram,
             string_split(b.bigram, ' ')[1] AS w1,
             string_split(b.bigram, ' ')[2] AS w2,
             b.n_ab, ua.n AS n_a, ub.n AS n_b,
             (CAST(b.n_ab AS DOUBLE) * CAST(ut.n_uni AS DOUBLE)
                * CAST(ut.n_uni AS DOUBLE))
               / (CAST(bt.n_bi AS DOUBLE) * CAST(ua.n AS DOUBLE)
                  * CAST(ub.n AS DOUBLE)) AS lift
      FROM bcnt b
      JOIN ucnt ua ON ua.tok = string_split(b.bigram, ' ')[1]
      JOIN ucnt ub ON ub.tok = string_split(b.bigram, ' ')[2]
      CROSS JOIN utot ut CROSS JOIN btot bt
      WHERE b.n_ab >= 5
    )
    SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, lift
    FROM (
      SELECT *, row_number() OVER (ORDER BY lift DESC, w1, w2) AS rn
      FROM lift
    ) WHERE rn <= 50
    """,
)
def pmi_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 adjacent-token bigrams by PMI *lift*
    ``p(ab) / (p(a)·p(b))`` — computed log-free so the score is a pure
    IEEE multiply/divide chain (identical bits in any engine); the
    ranking is identical to PMI because log is monotone.

    Scale: unigram and bigram count tables are vocab-bounded (tiny
    relative to the corpus), so the two resolution joins broadcast; the
    corpus itself is touched by exactly two explode+count passes with
    map-side partial aggregation.  Totals ride a broadcast scalar, not a
    collect.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(_tokens("text").alias("toks"))
    uni = toks.select(F.explode("toks").alias("tok"))
    # ucnt feeds the total aggregate AND both resolution joins (3 refs),
    # bcnt the total AND the scored frame (2) — each reference re-ran
    # its corpus explode+count pass (different projections defeat
    # ReuseExchange); pin the two vocab-bounded count tables so the
    # corpus is touched by exactly the two passes the docstring claims
    # (optimization r15)
    ucnt = pin(uni.groupBy("tok").agg(F.count("*").alias("n")))
    bi = toks.select(F.explode(word_grams_from_tokens("toks", 2)).alias("bigram"))
    bcnt = pin(
        bi.groupBy("bigram").agg(F.count("*").alias("n_ab"))
    )
    utot = ucnt.agg(F.sum("n").alias("n_uni"))
    btot = bcnt.agg(F.sum("n_ab").alias("n_bi"))
    parts = F.split("bigram", " ")
    scored = (
        bcnt.where(F.col("n_ab") >= 5)
        .withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(
            F.broadcast(ucnt.select(F.col("tok").alias("w1"), F.col("n").alias("n_a"))),
            "w1",
        )
        .join(
            F.broadcast(ucnt.select(F.col("tok").alias("w2"), F.col("n").alias("n_b"))),
            "w2",
        )
        .crossJoin(F.broadcast(utot))
        .crossJoin(F.broadcast(btot))
        .withColumn(
            "lift",
            (
                F.col("n_ab").cast("double")
                * F.col("n_uni").cast("double")
                * F.col("n_uni").cast("double")
            )
            / (
                F.col("n_bi").cast("double")
                * F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
            ),
        )
    )
    # top-50 via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps + driver merge of 50-row heads), not a single-partition
    # row_number window; the (lift, w1, w2) key is a total order so the
    # cut is deterministic
    return (
        scored.orderBy(F.desc("lift"), "w1", "w2")
        .limit(50)
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "lift",
        )
    )


def word_grams_from_tokens(toks_col: str, n: int):
    """``word_grams`` but over an already-materialized token array (the
    PMI query tokenizes once and feeds both the unigram and bigram
    passes)."""
    toks = F.col(toks_col)
    width = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, width)
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, width)
        grams = F.zip_with(
            grams, shifted, lambda acc, t: F.concat(acc, F.lit(" "), t)
        )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


@register(
    "token_entropy",
    rf"""
    WITH {_DOCS_CTE},
    uni AS (SELECT doc, unnest(toks) AS tok FROM toks),
    cnt AS (SELECT doc, tok, count(*) AS k FROM uni GROUP BY doc, tok),
    terms AS (
      SELECT doc,
             CAST(floor(log2(CAST(k AS DOUBLE)) * CAST(k AS DOUBLE)
                        * 1000000 + 0.5) AS BIGINT) AS term_micro,
             k
      FROM cnt
    ),
    agg AS (
      SELECT doc, sum(k) AS n_tokens, count(*) AS n_distinct,
             sum(term_micro) AS sum_term_micro
      FROM terms GROUP BY doc
    )
    SELECT doc AS doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(floor(
             (log2(CAST(n_tokens AS DOUBLE))
              - (CAST(sum_term_micro AS DOUBLE) / 1000000.0)
                / CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5
           ) AS BIGINT) AS entropy_micro
    FROM agg
    """,
)
def token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy (bits, 1e-6 grid) — the
    repetition/diversity quality signal: low entropy = looping or
    boilerplate text, high = diverse vocabulary.

    Determinism design: entropy's inner sum Σ k·log2(k) is quantized to
    integer micros PER TERM and summed as BIGINT — floating-point
    addition order (which differs between Spark's partial aggregates and
    any other engine) can never change the result.  The closed form
    ``log2(n) − Σk·log2(k)/n`` needs one log per distinct token, not per
    token.

    Scale: explode + two hash aggregates keyed by (doc, token) then doc —
    both map-side combinable; no joins, no windows.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    uni = docs.select(
        F.col("doc_id").alias("doc"), F.explode(_tokens("text")).alias("tok")
    )
    cnt = uni.groupBy("doc", "tok").agg(F.count("*").alias("k"))
    terms = cnt.select(
        "doc",
        "k",
        F.floor(
            F.log2(F.col("k").cast("double"))
            * F.col("k").cast("double")
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("term_micro"),
    )
    agg = terms.groupBy("doc").agg(
        F.sum("k").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum("term_micro").alias("sum_term_micro"),
    )
    return agg.select(
        F.col("doc").alias("doc_id"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.floor(
            (
                F.log2(F.col("n_tokens").cast("double"))
                - (F.col("sum_term_micro").cast("double") / 1000000.0)
                / F.col("n_tokens").cast("double")
            )
            * 1000000
            + 0.5
        )
        .cast("long")
        .alias("entropy_micro"),
    )


@register(
    "zipf_slope",
    rf"""
    WITH {_DOCS_CTE},
    uni AS (SELECT unnest(toks) AS tok FROM toks),
    freq AS (SELECT tok, count(*) AS n FROM uni GROUP BY tok),
    ranked AS (
      SELECT tok, n,
             row_number() OVER (ORDER BY n DESC, tok) AS rnk
      FROM freq
    ),
    pts AS (
      SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(CAST(n AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
      FROM ranked WHERE rnk <= 300
    ),
    s AS (
      SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM pts
    )
    SELECT CAST(m AS BIGINT) AS n_ranks,
           CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
           CAST(m * sxy - sx * sy AS DOUBLE)
             / CAST(m * sxx - sx * sx AS DOUBLE) AS slope
    FROM s
    """,
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit: least-squares slope of ln(freq) vs
    ln(rank) over the top-300 token ranks — natural text sits near −1;
    synthetic or templated corpora deviate hard (a corpus-health gate).

    Determinism design: each point's logs are quantized to a 1e-4
    integer grid FIRST; the regression's Σx, Σy, Σxy, Σx² are then exact
    BIGINT sums (order-free), and the slope is one exact-integer
    division.  ``regr_slope`` was rejected exactly because its double
    accumulation order differs between engines.  Overflow headroom:
    x,y ≤ ~1e5 → m·Σxy ≤ ~1e15 at any corpus size (logs grow, counts
    don't enter the sums).

    Scale: one explode+count pass (map-side combinable); the top-300
    cut is a distributed TakeOrderedAndProject over the vocab table
    BEFORE the ranking window (round 7 — previously the partition-less
    window single-partitioned the whole vocab just to discard all but
    300 rows; at web-scale vocab that one task is a stall).  The
    window then ranks 300 rows — identical output (the (n desc, tok)
    order is total, so top-300-then-rank == rank-then-filter), and the
    final stats are a scalar aggregate.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    uni = docs.select(F.explode(_tokens("text")).alias("tok"))
    freq = uni.groupBy("tok").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("n"), "tok")
    pts = (
        freq.orderBy(F.desc("n"), "tok").limit(300)
        .withColumn("rnk", F.row_number().over(w))
        .select(
            F.floor(F.log(F.col("rnk").cast("double")) * 10000 + 0.5)
            .cast("long")
            .alias("x"),
            F.floor(F.log(F.col("n").cast("double")) * 10000 + 0.5)
            .cast("long")
            .alias("y"),
        )
    )
    s = pts.agg(
        F.count("*").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        F.col("m").cast("long").alias("n_ranks"),
        F.col("sx").cast("long").alias("sum_x"),
        F.col("sy").cast("long").alias("sum_y"),
        (
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("slope"),
    )


@register(
    "langid_confusion",
    f"""
    WITH pred AS ({_lang_sql()}),
    conf AS (
      SELECT lang, lang_pred, count(*) AS n
      FROM pred GROUP BY lang, lang_pred
    ),
    tot AS (SELECT lang, sum(n) AS n_lang FROM conf GROUP BY lang)
    SELECT c.lang, c.lang_pred, CAST(c.n AS BIGINT) AS n,
           CAST(c.n AS DOUBLE) / CAST(t.n_lang AS DOUBLE) AS frac
    FROM conf c JOIN tot t ON c.lang = t.lang
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: labeled ``lang`` vs n-gram-predicted
    ``lang_pred`` with per-label share — the audit that decides whether
    the cheap marker classifier is trustworthy enough to gate a corpus.

    Scale: the classifier is a pure expression chain; the matrix is a
    two-key aggregate of language-pair cardinality (tiny), and the
    per-label total rides a broadcast join of that tiny table.
    """
    docs = load_table(spark, sf_dir, "documents")
    pred = textstats.lang_id(docs).select("lang", "lang_pred")
    conf = pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
    tot = conf.groupBy("lang").agg(F.sum("n").alias("n_lang"))
    return (
        conf.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "lang_pred",
            F.col("n").cast("long").alias("n"),
            (
                F.col("n").cast("double") / F.col("n_lang").cast("double")
            ).alias("frac"),
        )
    )


# --- cross-document structure ------------------------------------------------


@register(
    "boilerplate_removal",
    rf"""
    WITH {_DOCS_CTE},
    lines AS (
      SELECT doc, i AS pos,
             toks[3*i+1] || ' ' || toks[3*i+2] || ' ' || toks[3*i+3] AS line
      FROM toks, unnest(range(0, len(toks) // 3)) AS t(i)
    ),
    ldf AS (
      SELECT line, count(DISTINCT doc) AS df FROM lines GROUP BY line
    ),
    marked AS (
      SELECT l.doc, l.pos, l.line, (d.df >= {BOILER_DF}) AS boiler
      FROM lines l JOIN ldf d ON l.line = d.line
    )
    SELECT doc AS doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           substr(md5(coalesce(
             string_agg(line, ' ' ORDER BY pos)
               FILTER (WHERE NOT boiler), '')), 1, 16) AS kept_hash
    FROM marked GROUP BY doc
    """,
)
def boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-line removal (CCNet/RefinedWeb-style
    boilerplate dedup): split each doc into non-overlapping 3-token
    lines, count each line's document frequency across the corpus, drop
    lines appearing in ≥ BOILER_DF docs, and emit the kept-text
    fingerprint per doc.

    Scale: the line-DF table is the only shuffle (keyed by line hash,
    map-side combinable); the boiler mark joins postings back on the
    line key.  Reassembly sorts WITHIN each doc's lines only
    (array_sort of a per-doc collected list — no global sort).  Hot
    lines are the skew hazard: exactly the stop-shingle situation, and
    the same DF-cap remedy applies if a line's posting list explodes.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.col("doc_id").alias("doc"), _tokens("text").alias("toks"))
    nwin = F.floor(F.size("toks") / 3).cast("int")
    lines = toks.where(F.size("toks") >= 3).select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nwin - 1),
                lambda i: F.concat(
                    F.element_at(F.col("toks"), i * 3 + 1),
                    F.lit(" "),
                    F.element_at(F.col("toks"), i * 3 + 2),
                    F.lit(" "),
                    F.element_at(F.col("toks"), i * 3 + 3),
                ),
            )
        ).alias("pos", "line"),
    )
    # lines feeds the DF aggregate AND the mark join side; the exchange
    # children differ, so the tokenize+line-window chain ran twice —
    # pin it (optimization r15, the minhash-lane pattern)
    lines = pin(lines)
    ldf = lines.groupBy("line").agg(
        F.count_distinct("doc").alias("df")
    )
    marked = lines.join(ldf, "line").withColumn(
        "boiler", F.col("df") >= BOILER_DF
    )
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    ~F.col("boiler"), F.struct(F.col("pos"), F.col("line"))
                )
            )
        ),
        lambda x: x["line"],
    )
    return marked.groupBy("doc").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("boiler"), 1).otherwise(0))
        .cast("long")
        .alias("n_boiler"),
        F.substring(
            F.md5(F.concat_ws(" ", kept_sorted)), 1, 16
        ).alias("kept_hash"),
    ).select(
        F.col("doc").alias("doc_id"), "n_lines", "n_boiler", "kept_hash"
    )


@register(
    "containment_pairs",
    rf"""
    WITH {_DOCS_CTE},
    sizes AS (SELECT doc, len(shingles) AS n_sh FROM sh),
    posts AS (SELECT doc, unnest(shingles) AS shingle FROM sh),
    common AS (
      SELECT a.doc AS doc_sub, b.doc AS doc_super, count(*) AS n_common
      FROM posts a JOIN posts b USING (shingle)
      WHERE a.doc <> b.doc
      GROUP BY 1, 2
    )
    SELECT doc_sub, doc_super, CAST(n_common AS BIGINT) AS n_common,
           CAST(s.n_sh AS BIGINT) AS n_sh_sub,
           CAST(n_common AS DOUBLE) / CAST(s.n_sh AS DOUBLE) AS containment
    FROM common JOIN sizes s ON s.doc = doc_sub
    WHERE s.n_sh >= {CONTAIN_MIN_SH}
      AND CAST(n_common AS DOUBLE) / CAST(s.n_sh AS DOUBLE) >= {CONTAIN_T}
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups: pairs where ≥ 80% of one doc's
    shingles appear in another — catches subset duplication (quoting,
    inclusion, page-within-crawl) that symmetric Jaccard misses because
    the union denominator dilutes small-in-large overlaps.

    Scale: the identical posting self-join as the Jaccard family (one
    shuffle on the shingle key, Σ posting² bounded by the DF cap
    playbook); containment just swaps the denominator, so the marginal
    cost over a Jaccard pass is zero when computed together.
    """
    docs = load_table(spark, sf_dir, "documents")
    # the shingle chain feeds the size lookup AND the posting self-join;
    # the two exchange children differ, so without a barrier the chain
    # runs twice — pin it (optimization r15, the minhash-lane pattern)
    shingled = pin(dedup._shingle_sets(docs, "doc_id", "text", 3))
    sizes = shingled.select("doc", F.size("shingles").alias("n_sh"))
    posts = shingled.select("doc", F.explode("shingles").alias("shingle"))
    a = posts.select(F.col("doc").alias("doc_sub"), "shingle")
    b = posts.select(F.col("doc").alias("doc_super"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("doc_sub") != F.col("doc_super"))
        .groupBy("doc_sub", "doc_super")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            sizes.select(F.col("doc").alias("doc_sub"), "n_sh"), "doc_sub"
        )
        .where(F.col("n_sh") >= CONTAIN_MIN_SH)
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.col("n_sh").cast("double"),
        )
        .where(F.col("containment") >= CONTAIN_T)
        .select(
            "doc_sub",
            "doc_super",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_sh").cast("long").alias("n_sh_sub"),
            "containment",
        )
    )


@register(
    "dup_token_inflation",
    rf"""
    WITH RECURSIVE {_DOCS_CTE},
    sizes AS (SELECT doc, len(shingles) AS n_sh FROM sh),
    posts AS (SELECT doc, unnest(shingles) AS shingle FROM sh),
    common AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_common
      FROM posts a JOIN posts b USING (shingle)
      WHERE a.doc < b.doc
      GROUP BY 1, 2
    ),
    jpairs2 AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sizes sa ON sa.doc = doc_a
      JOIN sizes sb ON sb.doc = doc_b
      WHERE CAST(n_common AS DOUBLE)
              / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= {JACCARD_T}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM jpairs2
      UNION SELECT doc_b, doc_a FROM jpairs2
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
    tk AS (
      SELECT doc, len(toks) AS n_tokens FROM toks
    )
    SELECT CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
           CAST(coalesce(sum(t.n_tokens)
             FILTER (WHERE c.cluster_id IS NOT NULL
                       AND c.cluster_id <> t.doc), 0) AS BIGINT)
             AS dup_tokens,
           CAST(coalesce(sum(CASE WHEN c.cluster_id IS NOT NULL
                       AND c.cluster_id <> t.doc THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_dup_docs,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(t.n_tokens)
             FILTER (WHERE c.cluster_id IS NOT NULL
                       AND c.cluster_id <> t.doc), 0) AS DOUBLE)
             / CAST(sum(t.n_tokens) AS DOUBLE) AS inflation
    FROM tk t LEFT JOIN comp c ON c.id = t.doc
    """,
)
def dup_token_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication economics: the fraction of corpus TOKENS held by
    non-representative members of near-dup clusters — the number that
    says how much compute a training run wastes re-reading duplicates
    (doc-count dup rates understate it when long docs duplicate).

    Scale: reuses the Jaccard + connected-components pipeline (bucketed
    posting join, log-round CC); the inflation sum itself is one
    broadcast-joined aggregate over per-doc token counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=JACCARD_T)
    clusters = dedup.cluster_duplicates(pairs)  # (doc_id, cluster_id)
    tk = docs.select(
        F.col("doc_id").alias("doc"),
        F.size(_tokens("text")).cast("long").alias("n_tokens"),
    )
    joined = tk.join(
        clusters.select(
            F.col("doc_id").alias("doc"), F.col("cluster_id")
        ),
        "doc",
        "left",
    ).withColumn(
        "is_dup",
        F.col("cluster_id").isNotNull()
        & (F.col("cluster_id") != F.col("doc")),
    )
    return joined.agg(
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("is_dup"), F.col("n_tokens"))), F.lit(0)
        )
        .cast("long")
        .alias("dup_tokens"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_docs"),
        F.count("*").cast("long").alias("n_docs"),
        (
            F.coalesce(
                F.sum(F.when(F.col("is_dup"), F.col("n_tokens"))), F.lit(0)
            ).cast("double")
            / F.sum("n_tokens").cast("double")
        ).alias("inflation"),
    )


# --- rolling reach -----------------------------------------------------------


@register(
    "rolling_distinct_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    covered AS (
      SELECT CAST(day + i * INTERVAL 1 DAY AS DATE) AS cover_day, user_id
      FROM du, unnest(range(0, 7)) AS t(i)
    )
    SELECT cover_day, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_7d
    FROM covered GROUP BY cover_day
    """,
)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day (rolling reach /
    WAU) — COUNT(DISTINCT) over a sliding range frame, which no engine's
    window operator supports directly.  Rewritten as: distinct
    (day, user) pairs → each pair *covers* the next 7 days (bounded
    explode) → distinct count per covered day.

    Scale: the (day,user) distinct is the big shuffle and is exactly the
    dedup the raw data needs anyway; the ×7 expansion is constant-factor
    and map-side; the final count groups by (day,user) hash — never a
    per-day self-join (the naive SQL form is O(days × events)).
    """
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.col("ts").cast("timestamp_ntz")).alias("day"), "user_id"
    ).distinct()
    covered = du.select(
        F.explode(
            F.array(*[F.date_add("day", i) for i in range(7)])
        ).alias("cover_day"),
        "user_id",
    )
    return covered.groupBy("cover_day").agg(
        F.count_distinct("user_id").cast("long").alias("n_active_7d")
    )


# --- tokenizer induction -----------------------------------------------------


@register(
    "bpe_merge_step",
    rf"""
    WITH {_DOCS_CTE},
    uni AS (SELECT unnest(toks) AS w FROM toks),
    vocab AS (SELECT w, count(*) AS freq FROM uni GROUP BY w),
    pairs AS (
      SELECT substr(w, i, 2) AS pair, freq
      FROM vocab, unnest(range(1, length(w))) AS t(i)
    ),
    agg AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM pairs GROUP BY pair)
    SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT 20
    """,
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE tokenizer-induction step: count adjacent character pairs
    weighted by word frequency and emit the top-20 merge candidates.

    The classic BPE trick at scale: after one corpus pass builds the
    (word, freq) VOCABULARY, every subsequent merge iteration runs over
    the vocab table — thousands of rows, not terabytes — so tokenizer
    training cost is corpus-size-independent beyond the first count.
    This query is exactly that iteration shape: explode each vocab word
    into its adjacent char pairs, weight by freq, aggregate.

    Determinism: integer counts, (n desc, pair) total order,
    TakeOrderedAndProject for the cut.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    uni = docs.select(F.explode(_tokens("text")).alias("w"))
    vocab = uni.groupBy("w").agg(F.count("*").alias("freq"))
    # sequence(1, 0) would count DOWN in Spark — guard 1-char words
    pair_arr = F.when(
        F.length("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("w") - 1),
            lambda i: F.col("w").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = vocab.select(F.explode(pair_arr).alias("pair"), "freq")
    agg = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("n"))
    return agg.orderBy(F.desc("n"), "pair").limit(20)


# --- corpus health reporting -------------------------------------------------


@register(
    "ngram_novelty",
    rf"""
    WITH {_DOCS_CTE},
    posts AS (SELECT doc, unnest(shingles) AS shingle FROM sh),
    first_seen AS (
      SELECT shingle, min(doc) AS first_doc FROM posts GROUP BY shingle
    )
    SELECT p.doc AS doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = p.doc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = p.doc THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
    FROM posts p JOIN first_seen f USING (shingle)
    GROUP BY p.doc
    """,
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's shingles whose
    FIRST appearance (by ingest order = doc id) is this doc — the
    redundancy-growth curve a crawl operator watches: novelty trending to
    zero means the crawler is re-fetching what it already has.

    Scale: one posting pass → min-per-shingle aggregate (map-side
    combinable) → join postings back on the shingle key.  Same bucketed
    shuffle as every other posting operator; no per-doc history scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    # the shingle chain feeds the first-seen aggregate AND the posting
    # join side; different exchange children, so it ran twice — pin it
    # (optimization r15, the minhash-lane pattern)
    shingled = pin(dedup._shingle_sets(docs, "doc_id", "text", 3))
    posts = shingled.select("doc", F.explode("shingles").alias("shingle"))
    first_seen = posts.groupBy("shingle").agg(F.min("doc").alias("first_doc"))
    joined = posts.join(first_seen, "shingle")
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc"), 1).otherwise(0)
    )
    return joined.groupBy("doc").agg(
        F.count("*").cast("long").alias("n_shingles"),
        novel.cast("long").alias("n_novel"),
        (novel.cast("double") / F.count("*").cast("double")).alias("novelty"),
    ).select(
        F.col("doc").alias("doc_id"), "n_shingles", "n_novel", "novelty"
    )


@register(
    "corpus_quality_by_source",
    # _QUALITY_SQL is importable here (unlike in extension_queries, where
    # it is defined mid-module and spliced post-hoc)
    f"""
    WITH q AS ({{quality}})
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN q.quality_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality_ok,
           CAST(sum(CASE WHEN q.quality_ok THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS ok_rate,
           CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens
    FROM q JOIN documents d ON d.doc_id = q.doc_id
    GROUP BY d.source
    """,
)
def corpus_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality report: doc counts, quality-gate pass rate, and
    token volume — the table a mixture decision starts from (which
    sources are worth their ingest cost).

    Scale: the quality signals are a pure expression chain on one scan;
    the report is a single source-keyed aggregate (source cardinality is
    tiny).
    """
    docs = load_table(spark, sf_dir, "documents")
    q = textstats.quality_stats(docs)
    ok = F.sum(F.when(F.col("quality_ok"), 1).otherwise(0))
    return q.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        ok.cast("long").alias("n_quality_ok"),
        (ok.cast("double") / F.count("*").cast("double")).alias("ok_rate"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "doclen_percentiles_by_source",
    rf"""
    WITH {_DOCS_CTE},
    lens AS (
      SELECT d.source,
             CAST(CASE WHEN length(t.clean) = 0 THEN 0
                  ELSE len(t.toks) END AS BIGINT) AS n_tokens
      FROM toks t JOIN documents d ON d.doc_id = t.doc
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           quantile_disc(n_tokens, 0.5) AS p50_tokens,
           quantile_disc(n_tokens, 0.9) AS p90_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM lens GROUP BY source
    """,
)
def doclen_percentiles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per source (exact discrete p50/p90 —
    percentile_disc picks real data values, engine-agreement by
    construction) — the input to chunking/packing budget decisions.

    Scale: length is a per-row expression; exact grouped percentiles
    sort within source partitions only.  At 100 TB the report would move
    to t-digest sketches; the oracle needs the exact form.
    """
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "source", textstats.token_count("text").cast("long").alias("n_tokens")
    )
    return lens.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        # percentile_disc picks an actual data value but returns DOUBLE in
        # Spark; the value is an exact integer, so the long cast is lossless
        # (DuckDB's quantile_disc keeps BIGINT)
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)")
        .cast("long")
        .alias("p50_tokens"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_tokens)")
        .cast("long")
        .alias("p90_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )


# splice the quality CTE body into corpus_quality_by_source's oracle
# (same pattern as extension_queries' corpus_clean_final)
from .driver_queries import REGISTRY as _REG  # noqa: E402
from .extension_queries import _QUALITY_SQL as _QSQL  # noqa: E402

_REG["corpus_quality_by_source"] = (
    _REG["corpus_quality_by_source"][0],
    _REG["corpus_quality_by_source"][1].replace("{quality}", _QSQL),
)


# --- vector compression audit ------------------------------------------------


@register(
    "sq8_encode_audit",
    """
    WITH corpus AS (
      SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    per_dim AS (
      SELECT i AS dim, min(vec[i]) AS minv, max(vec[i]) AS maxv
      FROM corpus, unnest(range(1, 65)) AS t(i)
      GROUP BY i
    ),
    stats AS (
      SELECT list(minv ORDER BY dim) AS minarr,
             list(maxv ORDER BY dim) AS maxarr
      FROM per_dim
    ),
    coded AS (
      SELECT c.vec_id, c.vec, s.minarr, s.maxarr,
             list_transform(range(1, 65), i ->
               CASE WHEN maxarr[i] - minarr[i] > 0
                    THEN GREATEST(0.0, LEAST(255.0,
                      floor((vec[i] - minarr[i])
                            / (maxarr[i] - minarr[i]) * 255 + 0.5)))
                    ELSE 0.0 END) AS codes
      FROM corpus c CROSS JOIN stats s
    )
    SELECT vec_id,
           CAST(64 AS INT) AS n_dims,
           CAST(list_reduce(codes, (acc, x) -> acc + x) AS BIGINT)
             AS code_sum,
           CAST(floor(list_reduce(
             list_transform(range(1, 65), i ->
               (vec[i] - (minarr[i]
                          + codes[i] * (maxarr[i] - minarr[i]) / 255.0))
               * (vec[i] - (minarr[i]
                            + codes[i] * (maxarr[i] - minarr[i]) / 255.0))),
             (acc, x) -> acc + x) * 1000000000 + 0.5) AS BIGINT)
             AS recon_err_q9
    FROM coded
    """,
)
def sq8_encode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (int8) vector quantization audit: per-dimension min/max
    trained over the corpus, every embedding encoded to 64 uint8 codes,
    and the per-vector reconstruction error reported — the SQ companion
    to PQ (`pq_encode_codes`), closing the standard ANN compression
    stack (brute / LSH / IVF / PQ / SQ).

    Determinism: codes are exact small integers from one mirrored IEEE
    expression; the error sum is a LEFT FOLD in array order
    (``F.aggregate`` ≡ ``list_reduce``) so no shuffle order touches a
    float, quantized to a 1e-9 grid only at the very end.

    Scale: the trained quantizer is a 64-row aggregate (collected into
    ONE broadcast row — a model artifact, like IVF centroids); encoding
    is map-only over the corpus.  Constant dimensions quantize to code 0
    with zero error by the scale>0 guard.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "vec"
        ),
    )
    per_dim = (
        corpus.select(F.posexplode("vec").alias("dim0", "x"))
        .groupBy("dim0")
        .agg(F.min("x").alias("minv"), F.max("x").alias("maxv"))
    )
    stats = per_dim.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim0", "minv"))),
            lambda s: s["minv"],
        ).alias("minarr"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim0", "maxv"))),
            lambda s: s["maxv"],
        ).alias("maxarr"),
    )

    j = corpus.crossJoin(F.broadcast(stats))

    def at(arr, i):
        return F.element_at(F.col(arr), i)

    def code_at(i):
        scale = at("maxarr", i) - at("minarr", i)
        raw = F.floor(
            (at("vec", i) - at("minarr", i)) / scale * 255 + 0.5
        ).cast("double")
        return F.when(
            scale > 0,
            F.greatest(F.lit(0.0), F.least(F.lit(255.0), raw)),
        ).otherwise(F.lit(0.0))

    coded = j.select(
        "vec_id",
        "vec",
        "minarr",
        "maxarr",
        F.transform(
            F.sequence(F.lit(1), F.lit(64)), lambda i: code_at(i)
        ).alias("codes"),
    )

    def err_at(i):
        scale = at("maxarr", i) - at("minarr", i)
        recon = at("minarr", i) + at("codes", i) * scale / F.lit(255.0)
        d = at("vec", i) - recon
        return d * d

    return coded.select(
        "vec_id",
        F.lit(64).cast("int").alias("n_dims"),
        F.aggregate(
            F.col("codes"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long"),
        ).alias("code_sum"),
        F.floor(
            F.aggregate(
                F.transform(F.sequence(F.lit(1), F.lit(64)), err_at),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * 1000000000
            + 0.5
        )
        .cast("long")
        .alias("recon_err_q9"),
    )


# --- time-series anomaly detection -------------------------------------------


@register(
    "daily_anomalies",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
      -- x*x sums overflow BIGINT past ~sf0.1: accumulate in HUGEINT
      -- (mirrors Spark's DECIMAL(38,0) — both are exact integers, and
      -- both convert to the same nearest-double at the final division)
      SELECT event_type, count(*) AS n, sum(x) AS sx,
             sum(CAST(x AS HUGEINT) * x) AS sxx
      FROM daily GROUP BY event_type
    ),
    z AS (
      SELECT d.event_type, d.day, d.x,
             CAST(s.n * d.x - s.sx AS HUGEINT) AS num,
             CAST(s.n AS HUGEINT) * s.sxx
               - CAST(s.sx AS HUGEINT) * s.sx AS den
      FROM daily d JOIN stats s ON d.event_type = s.event_type
    )
    SELECT event_type, day, x AS value_mic,
           CAST(num * num AS DOUBLE) / CAST(den AS DOUBLE) AS zsq
    FROM z
    WHERE den > 0
      AND CAST(num * num AS DOUBLE) / CAST(den AS DOUBLE) >= 4.0
    """,
)
def daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly days: per event type, daily value totals whose
    squared z-score ≥ 4 (|z| ≥ 2 σ) against that type's own daily
    distribution — the ops-monitoring staple (spend spikes, traffic
    drops).

    Exactness design: daily totals are exact 1e-4-grid micros (BIGINT);
    z² is derived WITHOUT a sqrt or any float accumulation —
    ``z² = (n·x − Σx)² / (n·Σx² − (Σx)²)`` is a ratio of exact integers
    with ONE final double division, so the ≥ 4 threshold can never flip
    between engines.  Degenerate series (zero variance) are excluded by
    the guard, not divided by zero.

    Scale: two grouped aggregates (day-level then type-level stats) and
    a broadcast join of the tiny per-type stats back onto daily rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.col("ts").cast("timestamp_ntz")).alias("day"),
            F.floor(F.col("value") * 10000 + F.lit(0.5))
            .cast("long")
            .alias("v_mic"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v_mic").cast("long").alias("x"))
    )
    # x*x sums overflow BIGINT past ~sf0.1 (measured: n*max_x^2 = 2e19
    # at sf0.1) and Spark ANSI would raise — accumulate in DECIMAL(38,0)
    # (DuckDB mirrors with HUGEINT; both exact, both reach the same
    # nearest-double at the one final division)
    dec = "decimal(38,0)"
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    num = (F.col("n") * F.col("x") - F.col("sx")).cast(dec)
    den = (
        F.col("n").cast(dec) * F.col("sxx")
        - F.col("sx").cast(dec) * F.col("sx")
    )
    zsq = (num * num).cast("double") / den.cast("double")
    return (
        j.where(den > 0)
        .withColumn("zsq", zsq)
        .where(F.col("zsq") >= 4.0)
        .select(
            "event_type",
            "day",
            F.col("x").alias("value_mic"),
            "zsq",
        )
    )


# --- classic warehouse analytics --------------------------------------------


@register(
    "rfm_segments",
    """
    WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
    per_cust AS (
      SELECT o_custkey AS custkey,
             CAST(date_diff('day', max(o_orderdate),
                            (SELECT maxd FROM mx)) AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS monetary_mic
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, recency_days, frequency, monetary_mic,
           CAST(ntile(5) OVER (ORDER BY recency_days, custkey) AS INT)
             AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS INT)
             AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_mic DESC, custkey) AS INT)
             AS m_score
    FROM per_cust
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order vs the
    corpus horizon), frequency (order count), monetary (exact micro
    total), each scored into quintiles — the classic warehouse
    segmentation the reference's analysts would run over ejecutoras.

    Determinism: all three metrics are exact integers; every ntile
    ORDER BY carries the custkey tiebreak so quintile boundaries are a
    total order.  Scale note: global ntile is a single-partition sort of
    CUSTOMER-cardinality rows (not facts) — at 100 TB the scores switch
    to percentile_disc cutpoints computed once and joined broadcast;
    this exact form is what the oracle can mirror.
    """
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    per_cust = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("lastd"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(
                F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("monetary_mic"),
        )
        .crossJoin(F.broadcast(mx))
        .withColumn(
            "recency_days",
            F.datediff(F.col("maxd"), F.col("lastd")).cast("long"),
        )
    )
    wr = Window.orderBy("recency_days", "custkey")
    wf = Window.orderBy(F.desc("frequency"), "custkey")
    wm = Window.orderBy(F.desc("monetary_mic"), "custkey")
    return per_cust.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary_mic",
        F.ntile(5).over(wr).cast("int").alias("r_score"),
        F.ntile(5).over(wf).cast("int").alias("f_score"),
        F.ntile(5).over(wm).cast("int").alias("m_score"),
    )


@register(
    "basket_brand_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n_baskets AS (SELECT count(DISTINCT basket) AS nb FROM items),
    brand_count AS (
      SELECT brand, count(*) AS n FROM items GROUP BY brand
    ),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_ab
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )
    SELECT p.brand_a, p.brand_b,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
           (CAST(p.n_ab AS DOUBLE) * CAST(t.nb AS DOUBLE))
             / (CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE)) AS lift
    FROM pairs p
    JOIN brand_count ca ON ca.brand = p.brand_a
    JOIN brand_count cb ON cb.brand = p.brand_b
    CROSS JOIN n_baskets t
    WHERE p.n_ab >= 5
    """,
)
def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence at brand granularity: for brand pairs
    sharing an order, support counts and lift
    ``p(ab) / (p(a)·p(b))`` — the association-rule primitive.

    Scale: the basket self-join shuffles once on the basket key and each
    basket contributes O(brands-in-basket²) pairs — bounded because
    baskets are small (TPC-H ≤ 7 items) and the BRAND alphabet caps the
    aggregate at |brands|² rows.  Brand counts and the basket total ride
    broadcast joins; lift is a mirrored IEEE multiply/divide chain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    items = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == part["p_partkey"],
        )
        .select(
            F.col("l_orderkey").alias("basket"),
            F.col("p_brand").alias("brand"),
        )
        .distinct()
    )
    nb = items.agg(F.count_distinct("basket").alias("nb"))
    brand_count = items.groupBy("brand").agg(F.count("*").alias("n"))
    a = items.select("basket", F.col("brand").alias("brand_a"))
    b = items.select("basket", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    return (
        pairs.join(
            F.broadcast(
                brand_count.select(
                    F.col("brand").alias("brand_a"), F.col("n").alias("n_a")
                )
            ),
            "brand_a",
        )
        .join(
            F.broadcast(
                brand_count.select(
                    F.col("brand").alias("brand_b"), F.col("n").alias("n_b")
                )
            ),
            "brand_b",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                (F.col("n_ab").cast("double") * F.col("nb").cast("double"))
                / (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                )
            ).alias("lift"),
        )
    )


@register(
    "hhi_concentration",
    """
    WITH per_supp AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey,
             CAST(sum(CAST(floor(l.l_extendedprice * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS v
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    agg AS (
      SELECT nationkey,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             sum(CAST(v AS HUGEINT)) AS total_v,
             sum(CAST(v AS HUGEINT) * v) AS sum_v2
      FROM per_supp GROUP BY nationkey
    )
    SELECT nationkey, n_suppliers,
           CAST(total_v AS BIGINT) AS total_mic,
           CAST(sum_v2 AS DOUBLE)
             / (CAST(total_v AS DOUBLE) * CAST(total_v AS DOUBLE)) AS hhi
    FROM agg
    WHERE total_v > 0
    """,
)
def hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per nation: Herfindahl–Hirschman index
    ``Σ share_i²`` computed as the exact-integer ratio
    ``Σv² / (Σv)²`` — one mirrored double division at the end, never a
    per-supplier float share.  HHI → 1 means one supplier owns the
    nation's volume (the procurement-concentration audit the MEF data
    exists to answer).

    Scale: supplier-grain totals (one shuffle), then a nation-grain
    aggregate over supplier-cardinality rows.  v² accumulates in
    DECIMAL(38,0)/HUGEINT (v is micros ~1e11 at sf0.1 → v² ~1e22
    overflows BIGINT; same remedy as daily_anomalies).
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    dec = "decimal(38,0)"
    per_supp = (
        li.join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == s["s_suppkey"],
        )
        .groupBy(
            F.col("s_nationkey").alias("nationkey"), F.col("l_suppkey")
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 10000 + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("v")
        )
    )
    agg = per_supp.groupBy("nationkey").agg(
        F.count("*").cast("long").alias("n_suppliers"),
        F.sum(F.col("v").cast(dec)).alias("total_v"),
        F.sum(F.col("v").cast(dec) * F.col("v")).alias("sum_v2"),
    )
    return agg.where(F.col("total_v") > 0).select(
        "nationkey",
        "n_suppliers",
        F.col("total_v").cast("long").alias("total_mic"),
        (
            F.col("sum_v2").cast("double")
            / (
                F.col("total_v").cast("double")
                * F.col("total_v").cast("double")
            )
        ).alias("hhi"),
    )


# --- ML hygiene + scaling curves --------------------------------------------

_CURVE_BUCKET = (
    "CAST(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 10000"
)


@register(
    "kfold_assign",
    f"""
    SELECT doc_id, lang, source,
           CAST(({_CURVE_BUCKET.format(salt='fold')}) % 5 AS INT) AS fold
    FROM documents
    """,
)
def kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (k=5) by key hash — the same
    deterministic-bucket mechanics as `dataset_split`, generalized:
    stable across runs, partitionings, engines, and corpus appends, so a
    fold never silently reshuffles between experiments.

    Scale: one map-only expression; no shuffle at all.
    """
    from ..operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "source",
        (hash_bucket("doc_id", "fold") % 5).cast("int").alias("fold"),
    )


@register(
    "subsample_curve",
    f"""
    WITH {_DOCS_CTE},
    dec AS (
      SELECT doc,
             CAST(({_CURVE_BUCKET.format(salt='curve')}) // 1000 AS INT)
               AS decile,
             CASE WHEN length(clean) = 0 THEN 0 ELSE len(toks) END
               AS n_tokens,
             toks
      FROM toks t JOIN documents d ON d.doc_id = t.doc
    ),
    doc_stats AS (
      SELECT decile, count(*) AS n_docs, sum(n_tokens) AS n_toks
      FROM dec GROUP BY decile
    ),
    tok_first AS (
      SELECT tok, min(decile) AS first_decile
      FROM (SELECT decile, unnest(toks) AS tok FROM dec)
      GROUP BY tok
    ),
    vocab_new AS (
      SELECT first_decile AS decile, count(*) AS new_vocab
      FROM tok_first GROUP BY first_decile
    ),
    spine AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS decile)
    SELECT s.decile,
           CAST(sum(coalesce(d.n_docs, 0))
                OVER (ORDER BY s.decile) AS BIGINT) AS n_docs_cum,
           CAST(sum(coalesce(d.n_toks, 0))
                OVER (ORDER BY s.decile) AS BIGINT) AS n_tokens_cum,
           CAST(sum(coalesce(v.new_vocab, 0))
                OVER (ORDER BY s.decile) AS BIGINT) AS vocab_cum
    FROM spine s
    LEFT JOIN doc_stats d ON d.decile = s.decile
    LEFT JOIN vocab_new v ON v.decile = s.decile
    """,
)
def subsample_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus subsampling curve: cumulative docs / tokens / distinct
    vocabulary at 10%, 20%, …, 100% deterministic hash-samples — the
    Heaps-law curve a scaling-law experiment reads before deciding how
    much corpus to train on (each decile's docs are a SUPERSET sample of
    the previous, by bucket construction).

    Determinism: the decile is a stable md5 bucket; the cumulative vocab
    uses each token's FIRST decile (min aggregate) so the union-distinct
    never recomputes per fraction.  Scale: one doc-level pass + one
    explode+min per token, then 10-row window arithmetic — the curve is
    corpus-size-independent past the two counting aggregates.
    """
    from ..operators.sampling import hash_bucket

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    dec = docs.select(
        F.col("doc_id").alias("doc"),
        F.floor(hash_bucket("doc_id", "curve") / 1000).cast("int").alias(
            "decile"
        ),
        _tokens("text").alias("toks"),
    ).withColumn("n_tokens", F.size("toks"))
    doc_stats = dec.groupBy("decile").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_toks")
    )
    tok_first = (
        dec.select("decile", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count("*").alias("new_vocab"))
    )
    spine = spark.range(10).select(F.col("id").cast("int").alias("decile"))
    w = Window.orderBy("decile")
    return (
        spine.join(F.broadcast(doc_stats), "decile", "left")
        .join(F.broadcast(tok_first), "decile", "left")
        .select(
            "decile",
            F.sum(F.coalesce("n_docs", F.lit(0)))
            .over(w)
            .cast("long")
            .alias("n_docs_cum"),
            F.sum(F.coalesce("n_toks", F.lit(0)))
            .over(w)
            .cast("long")
            .alias("n_tokens_cum"),
            F.sum(F.coalesce("new_vocab", F.lit(0)))
            .over(w)
            .cast("long")
            .alias("vocab_cum"),
        )
    )


@register(
    "events_user_lifetime",
    """
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('day', CAST(min(ts) AS DATE),
                          CAST(max(ts) AS DATE)) AS BIGINT) AS lifetime_days
    FROM events GROUP BY user_id
    """,
)
def events_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime profile: first/last seen, distinct active days,
    event count, span — the user-level activity table funnels and
    retention cohorts read from.

    Scale: one user-keyed aggregate; the distinct-day count rides the
    same shuffle (partial distinct per user key).  Timestamps stringify
    for the cross-engine hash (both engines print naive timestamps
    identically).
    """
    ev = load_table(spark, sf_dir, "events")
    ntz = F.col("ts").cast("timestamp_ntz")
    return ev.groupBy("user_id").agg(
        F.date_format(F.min(ntz), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
        F.date_format(F.max(ntz), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        F.count_distinct(F.to_date(ntz)).cast("long").alias("active_days"),
        F.count("*").cast("long").alias("n_events"),
        F.datediff(F.to_date(F.max(ntz)), F.to_date(F.min(ntz)))
        .cast("long")
        .alias("lifetime_days"),
    )


@register(
    "basket_size_histogram",
    """
    WITH sizes AS (
      SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(n_lines AS INT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) AS DOUBLE)
             / CAST((SELECT count(*) FROM sizes) AS DOUBLE) AS frac
    FROM sizes GROUP BY n_lines
    """,
)
def basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size distribution: how many orders carry k line items, with
    exact share — the cardinality profile that sizes the basket
    self-join (`basket_brand_pairs` is O(Σ k²) in these buckets).

    Scale: two hash aggregates (order-keyed then size-keyed); the total
    rides a 1-row broadcast scalar.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    total = sizes.agg(F.count("*").alias("total"))
    return (
        sizes.groupBy("n_lines")
        .agg(F.count("*").alias("n_orders"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("n_lines").cast("int").alias("n_lines"),
            F.col("n_orders").cast("long").alias("n_orders"),
            (
                F.col("n_orders").cast("double")
                / F.col("total").cast("double")
            ).alias("frac"),
        )
    )


@register(
    "small_group_suppression",
    """
    WITH n AS (
      SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
    ),
    kept AS (
      SELECT o.o_orderpriority, o.o_custkey
      FROM orders o JOIN n USING (o_custkey) WHERE n.cnt >= 5
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM kept GROUP BY o_orderpriority
    """,
)
def small_group_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disclosure-safe publication gate: primary suppression drops every
    customer whose order count is below k=5 BEFORE aggregation, then
    publishes per-priority counts — the k-anonymity rule public
    agencies apply to MEF-style aggregates (a 2-record cell identifies
    its members).  One window count per group, no join, no second scan
    (`textstats.suppress_small_groups`); integer outputs only, so the
    result is exact in any engine."""
    orders = load_table(spark, sf_dir, "orders")
    kept = textstats.suppress_small_groups(orders, ["o_custkey"], k=5)
    return kept.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )
