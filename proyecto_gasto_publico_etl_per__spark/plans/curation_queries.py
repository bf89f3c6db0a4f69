"""Declared queries for the corpus-curation operators (gopher gates,
unigram scoring, decontamination, source caps, semantic dedup, exact
grouped correlation).

Same oracle discipline as extension_queries: every DuckDB oracle mirrors
the Spark computation expression-for-expression — exact integer counts,
fixed-order double divisions, quantized score grids, no ln()/round().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation, dedup, similarity, star, stats
from ..sources.tables import load_table
from ..operators.skew import pin
from ..operators import textstats
from .driver_queries import _star_oracle, register
from .extension_queries import (
    _BUCKETS_SQL,
    _DOCS_CTE,
    _QUALITY_SQL,
    _lang_sql,
    NEARDUP_T,
)

#: eval-set membership for decontamination (deterministic synthetic split)
EVAL_MOD = 37
SOURCE_CAP_N = 20

#: winnowing: char-8-grams, window 4 (guarantee length = w + k - 1 = 11),
#: stop-fingerprint DF cap, min shared fingerprints per reported pair
WINNOW_K = 8
WINNOW_W = 4
WINNOW_MAX_DF = 10
WINNOW_MIN_SHARED = 2

_STOPLIST_SQL = "['the', 'and', 'of', 'is', 'to']"


_GOPHER_SQL = f"""
    WITH {_DOCS_CTE},
    sig AS (
      SELECT t.doc, t.toks,
             len(t.toks) AS n_tokens,
             len(list_distinct(t.toks)) AS n_unique,
             string_split(coalesce(d.rawtext, ''), chr(10)) AS lines
      FROM toks t
      JOIN (SELECT doc_id AS doc, text AS rawtext FROM documents) d
        ON d.doc = t.doc
    ),
    m AS (
      SELECT doc, n_tokens,
             CASE WHEN n_tokens > 0
                  THEN CAST(n_unique AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                  ELSE 0 END AS frac_unique,
             len(lines) AS n_lines,
             len(list_filter(lines,
                 l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) AS n_bullet,
             len(list_filter(lines, l -> rtrim(l) LIKE '%...')) AS n_ellipsis,
             len(list_intersect(list_distinct(toks), {_STOPLIST_SQL}))
                 AS stop_hits
      FROM sig
    ),
    r AS (
      SELECT doc, n_tokens, frac_unique, stop_hits,
             CASE WHEN n_lines > 0
                  THEN CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE)
                  ELSE 0 END AS bullet_ratio,
             CASE WHEN n_lines > 0
                  THEN CAST(n_ellipsis AS DOUBLE) / CAST(n_lines AS DOUBLE)
                  ELSE 0 END AS ellipsis_ratio
      FROM m
    )
    SELECT doc AS doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           frac_unique, bullet_ratio, ellipsis_ratio,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           (n_tokens BETWEEN {curation.GOPHER_MIN_TOKENS}
                         AND {curation.GOPHER_MAX_TOKENS}
             AND frac_unique >= {curation.GOPHER_MIN_UNIQUE_FRAC}
             AND bullet_ratio <= {curation.GOPHER_MAX_BULLET_RATIO}
             AND ellipsis_ratio <= {curation.GOPHER_MAX_ELLIPSIS_RATIO}
             AND stop_hits >= {curation.GOPHER_MIN_STOP_HITS}) AS gopher_ok
    FROM r
    """


@register("gopher_gates", _GOPHER_SQL)
def gopher_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style format/repetition quality gates over documents."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.gopher_rules(docs)


@register(
    "doc_curation_profile",
    f"""
    WITH q AS ({_QUALITY_SQL}),
    l AS ({_lang_sql()}),
    g AS ({_GOPHER_SQL}),
    fp AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(coalesce(text, ''),
                                           '\\s+', ' ', 'g'))))
                 AS content_hash,
             CAST(len(regexp_extract_all(coalesce(text, ''),
                                         '\\w{{1,4}}|[^\\w\\s]')) AS BIGINT)
                 AS n_subtokens
      FROM documents
    )
    SELECT q.doc_id, l.lang_pred,
           q.n_chars_clean, q.n_tokens, q.mean_token_len, q.punct_ratio,
           q.upper_ratio, q.stopword_ratio, q.quality_ok,
           g.frac_unique, g.bullet_ratio, g.ellipsis_ratio, g.stop_hits,
           g.gopher_ok,
           fp.content_hash, fp.n_subtokens
    FROM q
    JOIN l ON l.doc_id = q.doc_id
    JOIN g ON g.doc_id = q.doc_id
    JOIN fp ON fp.doc_id = q.doc_id
    """,
)
def doc_curation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete per-doc curation record — language, quality signals,
    Gopher gates, content fingerprint, sub-token count — in ONE map-only
    pass: the signal operators compose column-append style over a single
    scan (no self-joins; the oracle joins because SQL must)."""
    docs = load_table(spark, sf_dir, "documents")
    prof = curation.gopher_rules(
        textstats.quality_stats(textstats.lang_id(docs)), append=True
    )
    return prof.select(
        "doc_id",
        "lang_pred",
        "n_chars_clean",
        "n_tokens",
        "mean_token_len",
        "punct_ratio",
        "upper_ratio",
        "stopword_ratio",
        "quality_ok",
        "frac_unique",
        "bullet_ratio",
        "ellipsis_ratio",
        "stop_hits",
        "gopher_ok",
        textstats.fingerprint("text").alias("content_hash"),
        textstats.bpe_ish_token_count("text").cast("bigint").alias(
            "n_subtokens"
        ),
    )


@register(
    "unigram_freq_score",
    f"""
    WITH {_DOCS_CTE},
    posts AS (SELECT doc, unnest(toks) AS tok FROM toks),
    vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
              FROM posts GROUP BY tok),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
    per_doc AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(cnt) AS BIGINT) AS sum_cnt,
             CAST(min(cnt) AS BIGINT) AS min_cnt
      FROM posts JOIN vocab USING (tok) GROUP BY doc
    )
    SELECT t.doc AS doc_id,
           coalesce(p.n_tokens, 0) AS n_tokens,
           coalesce(p.sum_cnt, 0) AS sum_cnt,
           coalesce(p.min_cnt, 0) AS min_cnt,
           CASE WHEN p.n_tokens IS NOT NULL
                THEN CAST(p.sum_cnt AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)
                     / CAST(total AS DOUBLE)
                ELSE 0 END AS mean_tok_freq
    FROM toks t LEFT JOIN per_doc p ON t.doc = p.doc CROSS JOIN tot
    """,
)
def unigram_freq_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-free unigram-LM commonness score (boilerplate detector)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.unigram_freq_score(docs)


@register(
    "decontaminate_eval",
    f"""
    WITH {_DOCS_CTE},
    eval_sh AS (
      SELECT DISTINCT unnest(shingles) AS shingle
      FROM sh WHERE doc % {EVAL_MOD} = 0
    ),
    train AS (SELECT doc, shingles FROM sh WHERE doc % {EVAL_MOD} <> 0),
    posts AS (SELECT doc, unnest(shingles) AS shingle FROM train),
    shared AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_shared
      FROM posts JOIN eval_sh USING (shingle) GROUP BY doc
    )
    SELECT t.doc AS doc_id,
           coalesce(s.n_shared, 0) AS n_shared,
           coalesce(s.n_shared, 0) > 0 AS contaminated
    FROM train t LEFT JOIN shared s ON t.doc = s.doc
    """,
)
def decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram-overlap decontamination of the train split against the
    deterministic eval split (doc_id % 37 == 0)."""
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % EVAL_MOD == 0)
    train = docs.where(F.col("doc_id") % EVAL_MOD != 0)
    return curation.decontaminate(train, eval_df)


@register(
    "decontaminate_report",
    f"""
    WITH {_DOCS_CTE},
    eval_sh AS (
      SELECT doc AS eval_doc, shingles FROM sh WHERE doc % {EVAL_MOD} = 0
    ),
    eposts AS (
      SELECT eval_doc, unnest(shingles) AS shingle FROM eval_sh
    ),
    tposts AS (
      SELECT doc AS train_doc, unnest(shingles) AS shingle
      FROM sh WHERE doc % {EVAL_MOD} <> 0
    ),
    hits AS (
      SELECT eval_doc,
             CAST(count(DISTINCT train_doc) AS BIGINT)
                 AS n_leaky_train_docs,
             CAST(count(DISTINCT shingle) AS BIGINT) AS n_shared_shingles,
             CAST(count(*) AS BIGINT) AS n_posting_hits
      FROM tposts JOIN eposts USING (shingle)
      GROUP BY eval_doc
    )
    SELECT e.eval_doc AS doc_id,
           CAST(len(e.shingles) AS BIGINT) AS n_shingles,
           coalesce(h.n_leaky_train_docs, 0) AS n_leaky_train_docs,
           coalesce(h.n_shared_shingles, 0) AS n_shared_shingles,
           coalesce(h.n_posting_hits, 0) AS n_posting_hits,
           CASE WHEN len(e.shingles) > 0
                THEN CAST(coalesce(h.n_shared_shingles, 0) AS DOUBLE)
                     / CAST(len(e.shingles) AS DOUBLE)
                ELSE 0 END AS leak_fraction
    FROM eval_sh e LEFT JOIN hits h USING (eval_doc)
    """,
)
def decontaminate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVAL-document leakage audit (the mirror of decontaminate_eval):
    which benchmark items the training split compromises, and how badly
    (operators/curation.decontamination_report)."""
    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("doc_id") % EVAL_MOD == 0)
    train = docs.where(F.col("doc_id") % EVAL_MOD != 0)
    return curation.decontamination_report(train, eval_df)


@register(
    "source_cap_sample",
    f"""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS INT) AS rn
      FROM documents
    )
    SELECT doc_id, source, rn FROM ranked WHERE rn <= {SOURCE_CAP_N}
    """,
)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap: at most N docs per source by deterministic hash
    order (mixture balancing)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.source_cap(docs, SOURCE_CAP_N)


@register(
    "pq_encode_codes",
    """
    WITH cb AS (
      SELECT CAST(row_number() OVER (ORDER BY CAST(('0x' || substr(md5('ivf:' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000, vec_id) - 1 AS INT) AS code,
             embedding::DOUBLE[] AS cvec
      FROM (SELECT * FROM embeddings ORDER BY CAST(('0x' || substr(md5('ivf:' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000, vec_id LIMIT 16)
    ),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
    scored AS (
      SELECT corpus.vec_id, s.subspace, cb.code,
             CAST(floor(list_reduce(
               list_transform(range(1, 17),
                 i -> (vec[(s.subspace - 1) * 16 + i]
                       - cvec[(s.subspace - 1) * 16 + i])
                      * (vec[(s.subspace - 1) * 16 + i]
                         - cvec[(s.subspace - 1) * 16 + i])),
               (acc, x) -> acc + x) * 1000000 + 0.5) AS BIGINT) AS dist_q6
      FROM corpus
      CROSS JOIN cb
      CROSS JOIN (SELECT CAST(unnest(range(1, 5)) AS INT) AS subspace) s
    ),
    best AS (
      SELECT vec_id, subspace, code, dist_q6,
             row_number() OVER (
               PARTITION BY vec_id, subspace ORDER BY dist_q6, code
             ) AS rk
      FROM scored
    )
    SELECT vec_id, CAST(subspace AS INT) AS subspace,
           CAST(code AS INT) AS code, dist_q6
    FROM best WHERE rk = 1
    """,
)
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes for every embedding: 4 subspaces × 16
    deterministic codewords, argmin quantized squared-L2 — single scan,
    zero joins (the codebook is a plan literal)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_encode(emb)


@register(
    "kmeans_step_means",
    """
    WITH cents AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec
      FROM embeddings
      ORDER BY CAST(('0x' || substr(md5('ivf:' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000, vec_id LIMIT 16
    ),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
    assign AS (
      SELECT vec_id, vec, cid FROM (
        SELECT corpus.vec_id, corpus.vec, cents.cid,
               row_number() OVER (
                 PARTITION BY corpus.vec_id
                 ORDER BY CAST(floor(list_cosine_similarity(vec, cvec) * 1000
                               + 0.5) AS BIGINT) DESC, cents.cid
               ) AS ark
        FROM corpus CROSS JOIN cents
      ) WHERE ark = 1
    ),
    pe AS (
      SELECT cid, generate_subscripts(vec, 1) AS pos, unnest(vec) AS val
      FROM assign
    ),
    c AS (
      SELECT cid, pos, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(val * 1000000 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_q6
      FROM pe GROUP BY 1, 2
    )
    SELECT cid, pos, n, sum_q6,
           CAST(sum_q6 AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
               AS mean_val
    FROM c
    """,
)
def kmeans_step_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd iteration over the embeddings: map-only
    nearest-centroid assignment, then exact-quantized per-dimension
    means in long format (one hash aggregate)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_step(emb)


@register(
    "semantic_dedup_keep",
    f"""
    WITH RECURSIVE {_BUCKETS_SQL.format(n_planes=4)},
    v AS (
      SELECT b.vec_id, e.embedding::DOUBLE[] AS vec, b.bucket
      FROM buckets b JOIN embeddings e USING (vec_id)
    ),
    dup_pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b USING (bucket)
      WHERE a.vec_id < b.vec_id
        AND CAST(floor(list_cosine_similarity(a.vec, b.vec) * 1000 + 0.5)
                 AS BIGINT) >= {int(NEARDUP_T * 1000)}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM dup_pairs
      UNION
      SELECT id_b, id_a FROM dup_pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT id AS vec_id, min(r) AS cluster_id,
           (id = min(r)) AS keep
    FROM reach GROUP BY id
    """,
)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: embedding near-dup pairs (LSH
    buckets + exact cosine verify) → connected components → keep the
    minimum id of each cluster.  Composition of two audited operators;
    the corpus never all-pairs joins."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.embedding_neardup_pairs(emb, threshold=NEARDUP_T)
    labels = dedup.cluster_duplicates(pairs, "id_a", "id_b")
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


#: mixture construction: total token budget × per-language weights,
#: precomputed to integer allocations (floor) so both engines agree
MIXTURE_BUDGET = 10_000
MIXTURE_WEIGHTS = {"en": 0.6, "es": 0.2, "de": 0.1, "fr": 0.06, "zh": 0.04}
MIXTURE_ALLOC = {
    lang: int(MIXTURE_BUDGET * w) for lang, w in MIXTURE_WEIGHTS.items()
}


def _alloc_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {b}"
        for lang, b in sorted(MIXTURE_ALLOC.items())
    )
    return f"CASE lang {whens} ELSE 0 END"


@register(
    "winnow_overlap_pairs",
    f"""
    WITH base AS (
      SELECT doc_id AS doc,
             lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))
                 AS clean
      FROM documents
    ),
    h AS (
      SELECT doc,
             list_transform(
               range(1, greatest(length(clean) - {WINNOW_K - 1}, 1) + 1),
               i -> CAST(('0x' || substr(md5(substr(clean, i, {WINNOW_K})),
                                         1, 8)) AS BIGINT)) AS hashes
      FROM base
    ),
    wmin AS (
      SELECT doc,
             list_distinct(list_transform(
               range(1, greatest(len(hashes) - {WINNOW_W - 1}, 1) + 1),
               j -> list_min(hashes[j:j + {WINNOW_W - 1}]))) AS fps
      FROM h
    ),
    posts AS (SELECT doc, unnest(fps) AS fp FROM wmin),
    dfreq AS (SELECT fp, count(*) AS df FROM posts GROUP BY 1),
    keep AS (SELECT fp FROM dfreq WHERE df <= {WINNOW_MAX_DF}),
    cp AS (SELECT p.doc, p.fp FROM posts p JOIN keep USING (fp))
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM cp a JOIN cp b USING (fp)
    WHERE a.doc < b.doc
    GROUP BY 1, 2
    HAVING count(*) >= {WINNOW_MIN_SHARED}
    """,
)
def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-edit-robust overlap pairs via windowed winnowing: docs
    sharing ≥ {min_shared} rare winnow fingerprints (any common
    substring of length ≥ w+k-1 = 11 chars is guaranteed to surface).
    Same posting-join scale discipline as the n-gram path: stop
    fingerprints above the DF cap never generate candidates."""
    docs = load_table(spark, sf_dir, "documents")
    # the winnow chain (md5 per char k-gram) feeds the DF count AND the
    # candidate self-join; the count's exchange child differs from the
    # join sides' so ReuseExchange cannot merge them and the chain ran
    # twice — pin it to one execution (optimization r15, the
    # minhash-lane pattern)
    posts = pin(
        textstats.winnow_fingerprints(docs, k=WINNOW_K, w=WINNOW_W)
    )
    dfreq = posts.groupBy("fp").agg(F.count("*").alias("df"))
    keep = dfreq.where(F.col("df") <= WINNOW_MAX_DF).select("fp")
    cp = posts.join(keep, "fp")
    a, b = cp.alias("a"), cp.alias("b")
    return (
        a.join(b, "fp")
        .where(F.col("a.doc") < F.col("b.doc"))
        .groupBy(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


@register(
    "mixture_budget_fill",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(regexp_replace(coalesce(text, ''),
                                        '\\s+', ' ', 'g'))) = 0 THEN 0
                  ELSE len(string_split(lower(trim(regexp_replace(
                         coalesce(text, ''), '\\s+', ' ', 'g'))), ' '))
                  END AS BIGINT) AS n_tokens,
             CAST({_alloc_case_sql()} AS BIGINT) AS alloc
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens, alloc,
             CAST(sum(n_tokens) OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= alloc
    """,
)
def mixture_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture materialization: fill each language's
    allocation (budget × weight) in deterministic hash order."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.mixture_fill(docs, MIXTURE_ALLOC)


@register(
    "mixture_temperature_fill",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(CASE WHEN length(trim(regexp_replace(coalesce(text, ''),
                                        '\\s+', ' ', 'g'))) = 0 THEN 0
                  ELSE len(string_split(lower(trim(regexp_replace(
                         coalesce(text, ''), '\\s+', ' ', 'g'))), ' '))
                  END AS BIGINT) AS n_tokens
      FROM documents
    ),
    cnt AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT lang,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000) AS BIGINT)
               AS w_q
      FROM cnt
    ),
    tot AS (SELECT CAST(sum(w_q) AS BIGINT) AS total_q FROM w),
    alloc AS (
      SELECT lang,
             CAST(({MIXTURE_BUDGET} * w_q) // total_q AS BIGINT) AS alloc
      FROM w CROSS JOIN tot
    ),
    c AS (
      SELECT t.doc_id, t.lang, t.n_tokens, a.alloc,
             CAST(sum(t.n_tokens) OVER (
               PARTITION BY t.lang
               ORDER BY md5(CAST(t.doc_id AS VARCHAR)), t.doc_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_tokens
      FROM t JOIN alloc a USING (lang)
    )
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM c WHERE cum_tokens <= alloc
    """,
)
def mixture_temperature_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-calibrating mixture: temperature-flattened (α=0.5) language
    allocations computed FROM corpus counts (weight ∝ √n_docs — sqrt is
    IEEE correctly-rounded, unlike pow, so the artifact is cross-engine
    exact), then the same two-phase deterministic hash-order quota fill
    as mixture_budget_fill (operators/curation.mixture_temperature_fill)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.mixture_temperature_fill(docs, MIXTURE_BUDGET)


@register(
    "ratio_to_parent",
    _star_oracle(
        """
        WITH a AS (
          SELECT anio, sector_nombre, pliego_nombre,
                 SUM(monto_devengado) AS dev_dec
          FROM star GROUP BY 1, 2, 3
        )
        SELECT anio, sector_nombre, pliego_nombre,
               CAST(dev_dec AS DOUBLE) AS devengado,
               CASE WHEN SUM(dev_dec)
                         OVER (PARTITION BY anio, sector_nombre) > 0
                    THEN CAST(dev_dec AS DOUBLE)
                         / CAST(SUM(dev_dec)
                                OVER (PARTITION BY anio, sector_nombre)
                                AS DOUBLE)
                    ELSE 0 END AS share_in_sector,
               CASE WHEN SUM(dev_dec) OVER (PARTITION BY anio) > 0
                    THEN CAST(SUM(dev_dec)
                              OVER (PARTITION BY anio, sector_nombre)
                              AS DOUBLE)
                         / CAST(SUM(dev_dec) OVER (PARTITION BY anio)
                                AS DOUBLE)
                    ELSE 0 END AS sector_share_in_year
        FROM a
        """
    ),
)
def ratio_to_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: each pliego's share within its
    sector and each sector's share within its year, from ONE aggregate
    + two window totals (no re-scan, no joins).  Sums stay exact long
    micros through the windows (order-independent); each presented
    ratio is one double division."""
    from ..functions.money import GRID, gmicros
    from ..plans.testdata_star import build_star
    from pyspark.sql import Window

    star_df = build_star(spark, sf_dir)
    a = star_df.groupBy("anio", "sector_nombre", "pliego_nombre").agg(
        F.sum(gmicros("monto_devengado")).alias("mic")
    )
    sec_mic = F.sum("mic").over(Window.partitionBy("anio", "sector_nombre"))
    yr_mic = F.sum("mic").over(Window.partitionBy("anio"))
    as_dbl = lambda c: (c / GRID).cast("double")  # noqa: E731
    return a.select(
        "anio",
        "sector_nombre",
        "pliego_nombre",
        as_dbl(F.col("mic")).alias("devengado"),
        F.when(sec_mic > 0, as_dbl(F.col("mic")) / as_dbl(sec_mic))
        .otherwise(F.lit(0.0))
        .alias("share_in_sector"),
        F.when(yr_mic > 0, as_dbl(sec_mic) / as_dbl(yr_mic))
        .otherwise(F.lit(0.0))
        .alias("sector_share_in_year"),
    )


@register(
    "funnel_stage_times",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + (c.user_id IS NOT NULL)::INT
                  + (p.user_id IS NOT NULL)::INT AS INT) AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def funnel_stage_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): per user,
    the first time of each stage STRICTLY AFTER the previous stage, and
    the deepest stage reached.  Three key-grained aggregates chained by
    user_id equi-joins — each stage's input is already reduced to one
    row per user before the next join, so the fact never self-joins at
    event grain."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            )
            .cast("int")
            .alias("stage"),
        )
    )


@register(
    "cohort_retention",
    """
    WITH am AS (
      SELECT user_id,
             (CAST(year(ts) AS INT) * 12 + CAST(month(ts) AS INT)) AS ym
      FROM events GROUP BY 1, 2
    ),
    coh AS (SELECT user_id, min(ym) AS cohort_ym FROM am GROUP BY 1)
    SELECT coh.cohort_ym, am.ym - coh.cohort_ym AS month_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM am JOIN coh USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over the event stream: users grouped by
    first-active month, counted per months-since-cohort offset.  Two
    hash aggregates + one equi-join on user_id — the distinct-month
    reduction happens BEFORE the join, so the join input is bounded by
    |users| × |months|, not |events|."""
    ev = load_table(spark, sf_dir, "events")
    ym = (
        F.year("ts").cast("int") * 12 + F.month("ts").cast("int")
    ).alias("ym")
    am = ev.select("user_id", ym).distinct()
    coh = am.groupBy("user_id").agg(F.min("ym").alias("cohort_ym"))
    return (
        am.join(coh, "user_id")
        .groupBy(
            "cohort_ym",
            (F.col("ym") - F.col("cohort_ym")).alias("month_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


@register(
    "benford_first_digit",
    """
    WITH d AS (
      SELECT l_returnflag AS flag,
             substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
                    1, 1) AS digit
      FROM lineitem WHERE l_extendedprice >= 1
    ),
    c AS (SELECT flag, digit, CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1, 2),
    t AS (SELECT flag, sum(n) AS total FROM c GROUP BY 1)
    SELECT c.flag, c.digit, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS ratio
    FROM c JOIN t USING (flag)
    """,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of amounts per group — the
    classic Benford's-law audit profile for spending data.  One hash
    aggregate; the per-group total rides a window over the (≤ 9-row per
    group) aggregate, never a second pass over the fact."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice") >= 1
    )
    digit = F.substring(
        F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
    )
    c = (
        li.select(F.col("l_returnflag").alias("flag"), digit.alias("digit"))
        .groupBy("flag", "digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy("flag"))
    return c.select(
        "flag",
        "digit",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias("ratio"),
    )


@register(
    "scd1_merge_dim",
    """
    WITH upd_raw AS (
      SELECT c_custkey + 1000000 AS c_custkey,
             'NEW ' || c_name AS c_name, c_mktsegment
      FROM customer WHERE c_custkey % 50 = 0
      UNION ALL
      SELECT c_custkey, 'UPD ' || c_name AS c_name, c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
    ),
    upd AS (
      SELECT c_custkey, max(c_name) AS c_name,
             max(c_mktsegment) AS c_mktsegment
      FROM upd_raw GROUP BY c_custkey
    )
    SELECT coalesce(i.c_custkey, e.c_custkey) AS c_custkey,
           CASE WHEN i.c_custkey IS NOT NULL THEN i.c_name
                ELSE e.c_name END AS c_name,
           CASE WHEN i.c_custkey IS NOT NULL THEN i.c_mktsegment
                ELSE e.c_mktsegment END AS c_mktsegment
    FROM (SELECT c_custkey, c_name, c_mktsegment FROM customer) e
    FULL OUTER JOIN upd i ON e.c_custkey = i.c_custkey
    """,
)
def scd1_merge_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 MERGE over the customer dim: every 10th key gets an updated
    name, every 50th key re-enters shifted as a brand-new key."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    updates = cust.where(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
        "c_mktsegment",
    ).unionByName(
        cust.where(F.col("c_custkey") % 10 == 0).select(
            "c_custkey",
            F.concat(F.lit("UPD "), F.col("c_name")).alias("c_name"),
            "c_mktsegment",
        )
    )
    return star.scd1_merge(
        cust, updates, ["c_custkey"], ["c_name", "c_mktsegment"]
    )


@register(
    "corr_qty_price_by_flag",
    f"""
    WITH q AS (
      SELECT l_returnflag,
             CAST(floor(l_quantity * {stats.CORR_GRID} + 0.5) AS HUGEINT) AS x,
             CAST(floor(l_extendedprice * {stats.CORR_GRID} + 0.5) AS HUGEINT)
                 AS y
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                 AND CAST(n * syy - sy * sy AS DOUBLE) > 0
                THEN CAST(floor(
                       CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                       * {stats.CORR_GRID} + 0.5) AS BIGINT)
           END AS corr_q6
    FROM m
    """,
)
def corr_qty_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group Pearson correlation (quantity vs price by
    returnflag) from exact decimal moments."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.exact_grouped_corr(
        li, "l_quantity", "l_extendedprice", ["l_returnflag"]
    )


@register(
    "bigram_fluency",
    f"""
    WITH {_DOCS_CTE},
    bi AS (
      SELECT doc, list_zip(toks[1:len(toks)-1], toks[2:len(toks)]) AS bgs
      FROM toks WHERE len(toks) >= 2
    ),
    pairs AS (
      SELECT doc, p[1] AS w1, p[2] AS w2
      FROM (SELECT doc, unnest(bgs) AS p FROM bi)
    ),
    bigrams AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM pairs GROUP BY w1, w2
    ),
    contexts AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pairs GROUP BY w1
    ),
    scored AS (
      SELECT doc,
             CAST(floor(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)
                        * 1000000000 + 0.5) AS BIGINT) AS pq
      FROM pairs JOIN bigrams USING (w1, w2) JOIN contexts USING (w1)
    ),
    per_doc AS (
      SELECT doc, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(pq) AS BIGINT) AS sum_pq
      FROM scored GROUP BY doc
    )
    SELECT t.doc AS doc_id,
           coalesce(p.n_bigrams, 0) AS n_bigrams,
           CAST(p.sum_pq AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE)
             / 1000000000.0 AS mean_cond_prob
    FROM toks t LEFT JOIN per_doc p ON t.doc = p.doc
    """,
)
def bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score: per-doc mean MLE conditional probability
    P(w2|w1) over adjacent token pairs — the fluency complement to
    ``unigram_freq_score`` (word salad of common words scores low).
    Each conditional is quantized to an exact 1e-9 grid BEFORE the
    per-doc sum, so the score is partition-invariant and cross-engine
    exact (same discipline as the entropy/Zipf family)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.bigram_fluency_score(docs)


#: DSIR target-domain proxy: two of the twenty synthetic sources stand
#: in for the "high-quality target" sample the method conditions on
DSIR_TARGET_SOURCES = ("src0", "src1")


#: shared oracle for both DSIR entries: dsir_score_serving's persisted-
#: model path is value-identical to dsir_importance by the train/score
#: identity (test_dsir_train_score_roundtrip), so one DuckDB logic twin
#: checks both
_DSIR_SQL = f"""
    WITH {_DOCS_CTE},
    tagged AS (
      SELECT t.doc, t.toks, d.source IN ('src0', 'src1') AS is_t
      FROM toks t JOIN documents d ON d.doc_id = t.doc
    ),
    feats AS (
      SELECT doc, is_t,
             CAST(('0x' || substr(md5('g|' || feat), 1, 8)) AS BIGINT)
               % {curation.DSIR_BUCKETS} AS bucket
      FROM (
        SELECT doc, is_t,
               unnest(list_concat(
                 toks,
                 CASE WHEN len(toks) >= 2
                      THEN [p[1] || ' ' || p[2]
                            FOR p IN list_zip(toks[1:len(toks)-1],
                                              toks[2:len(toks)])]
                      ELSE []::VARCHAR[] END)) AS feat
        FROM tagged
      )
    ),
    bc AS (
      SELECT bucket,
             CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
             CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS c_r
      FROM feats GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
             CAST(sum(c_r) AS BIGINT) AS n_r
      FROM bc
    ),
    lr AS (
      SELECT bucket,
             CAST(floor(log2(
               (CAST(c_t + 1 AS DOUBLE)
                  / CAST(n_t + {curation.DSIR_BUCKETS} AS DOUBLE))
               / (CAST(c_r + 1 AS DOUBLE)
                  / CAST(n_r + {curation.DSIR_BUCKETS} AS DOUBLE))
             ) * 1000000 + 0.5) AS BIGINT) AS lr_micro
      FROM bc CROSS JOIN tot
    ),
    docfeat AS (
      SELECT doc, bucket, CAST(count(*) AS BIGINT) AS k
      FROM feats WHERE NOT is_t GROUP BY doc, bucket
    ),
    w AS (
      SELECT doc, CAST(sum(k) AS BIGINT) AS n_feats,
             CAST(sum(k * lr_micro) AS BIGINT) AS weight_micro
      FROM docfeat JOIN lr USING (bucket) GROUP BY doc
    )
    SELECT t.doc AS doc_id,
           coalesce(w.n_feats, 0) AS n_feats,
           coalesce(w.weight_micro, 0) AS weight_micro
    FROM tagged t LEFT JOIN w ON t.doc = w.doc
    WHERE NOT t.is_t
    """


@register("dsir_importance", _DSIR_SQL)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (hashed unigram+bigram bag, add-one
    smoothing, 1e-6-quantized per-bucket log-ratios → exact BIGINT doc
    sums): every raw doc scored by target-domain likeness, target =
    sources src0/src1.  The resampling score a mixture build feeds into
    its top-k selection."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.dsir_importance(
        docs, F.col("source").isin(*DSIR_TARGET_SOURCES)
    )


#: process-local train-once cache for the serving entry: sf_dir ->
#: model-store path of the persisted DSIR artifact.  Deliberately NOT
#: cross-process (a fresh process retrains once, so a regenerated
#: testdata set can never serve a stale model).
_DSIR_SERVING_MODELS: dict[str, str] = {}


@register("dsir_score_serving", _DSIR_SQL)
def dsir_score_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR path production actually repeats (round-6 verdict #5):
    train once per target refresh, persist the ≤4096-row log-ratio
    artifact through the model store, then every scoring run LOADS the
    model and runs the single posting pass + broadcast join —
    ``dsir_importance`` by contrast retrains inside every invocation.
    First call in a process trains + persists (the bench's warm run);
    timed runs measure load + score, so serving regressions are visible
    round-over-round.  Scores are value-identical to
    ``dsir_importance`` by the train/score identity
    (test_dsir_train_score_roundtrip), so both entries share one
    oracle."""
    import tempfile

    from ..operators import model_store

    docs = load_table(spark, sf_dir, "documents")
    is_t = F.col("source").isin(*DSIR_TARGET_SOURCES)
    path = _DSIR_SERVING_MODELS.get(sf_dir)
    if path is None:
        model = curation.dsir_train(docs, is_t)
        path = tempfile.mkdtemp(prefix="dsir_serving_") + "/model"
        model_store.save_dsir(spark, path, model)
        _DSIR_SERVING_MODELS[sf_dir] = path
    return curation.dsir_score(
        docs.where(~is_t), model_store.load_dsir(spark, path)
    )
