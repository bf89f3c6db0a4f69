"""Property tests for the round-5 analytics statistics: each Spark
result is re-derived by an independent pure-Python reference over the
same generated corpus (one DataFrame per hypothesis example batch)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from proyecto_gasto_publico_etl_per__spark.plans import analytics_queries as A

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: whitespace-token corpora: words from a small alphabet so duplicates,
#: repeated lines, and skewed frequencies actually occur
word = st.text(alphabet="abcde", min_size=1, max_size=4)
doc = st.lists(word, min_size=0, max_size=30).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=15)


def _entropy_ref(tokens: list[str]) -> float:
    """Reference entropy via the SAME per-term micro quantization the
    engine contracts (the property pins the quantization algebra, not
    float luck)."""
    n = len(tokens)
    counts = Counter(tokens)
    sum_term = sum(
        math.floor(math.log2(k) * k * 1_000_000 + 0.5)
        for k in counts.values()
    )
    return math.floor(
        (math.log2(n) - (sum_term / 1_000_000) / n) * 1_000_000 + 0.5
    )


@SETTINGS
@given(docs=corpus)
def test_token_entropy_matches_python_reference(spark, docs, tmp_path_factory):
    sf = tmp_path_factory.mktemp("ent")
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(docs)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in A.token_entropy(spark, str(sf)).collect()
    }
    for i, t in enumerate(docs):
        tokens = t.split() if t.strip() else []
        if not tokens:
            assert i not in out  # empty docs emit no row
            continue
        r = out[i]
        assert r["n_tokens"] == len(tokens)
        assert r["n_distinct"] == len(set(tokens))
        assert r["entropy_micro"] == _entropy_ref(tokens)


@SETTINGS
@given(docs=corpus)
def test_zipf_slope_matches_least_squares(spark, docs, tmp_path_factory):
    tokens = [w for t in docs for w in t.split()]
    freqs = Counter(tokens)
    if len(freqs) < 2:
        return  # slope undefined on a 0/1-point fit
    sf = tmp_path_factory.mktemp("zipf")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(docs)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    row = A.zipf_slope(spark, str(sf)).collect()[0]

    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:300]
    pts = [
        (
            math.floor(math.log(rnk) * 10000 + 0.5),
            math.floor(math.log(n) * 10000 + 0.5),
        )
        for rnk, (_, n) in enumerate(ranked, start=1)
    ]
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = m * sxx - sx * sx
    assert row["n_ranks"] == m
    assert row["sum_x"] == sx and row["sum_y"] == sy
    if den:
        assert row["slope"] == (m * sxy - sx * sy) / den


@SETTINGS
@given(docs=corpus)
def test_boilerplate_reference_reassembly(spark, docs, tmp_path_factory):
    sf = tmp_path_factory.mktemp("boiler")
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(docs)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {
        r["doc_id"]: r for r in A.boilerplate_removal(spark, str(sf)).collect()
    }

    # python reference: 3-token non-overlapping lines, df across docs
    lines_by_doc: dict[int, list[str]] = {}
    for i, t in enumerate(docs):
        toks = t.split()
        lines_by_doc[i] = [
            " ".join(toks[j * 3 : j * 3 + 3]) for j in range(len(toks) // 3)
        ]
    df_count: Counter = Counter()
    for ls in lines_by_doc.values():
        for line in set(ls):
            df_count[line] += 1
    boiler = {l for l, d in df_count.items() if d >= A.BOILER_DF}

    import hashlib

    for i, ls in lines_by_doc.items():
        if not ls:
            assert i not in out
            continue
        kept = " ".join(l for l in ls if l not in boiler)
        r = out[i]
        assert r["n_lines"] == len(ls)
        assert r["n_boiler"] == sum(1 for l in ls if l in boiler)
        assert r["kept_hash"] == hashlib.md5(kept.encode()).hexdigest()[:16]


@SETTINGS
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day offset
            st.integers(min_value=0, max_value=5),  # user
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rolling_distinct_users_matches_brute_force(
    spark, events, tmp_path_factory
):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    sf = tmp_path_factory.mktemp("roll")
    rows = [
        (
            k,
            base + datetime.timedelta(days=d, hours=k % 24),
            u,
            "click",
            1.0,
            "{}",
        )
        for k, (d, u) in enumerate(events)
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, "
        "event_type STRING, value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    got = {
        str(r["cover_day"]): r["n_active_7d"]
        for r in A.rolling_distinct_users(spark, str(sf)).collect()
    }

    by_day: dict[int, set[int]] = {}
    for d, u in events:
        by_day.setdefault(d, set()).add(u)
    want: dict[str, int] = {}
    for d in range(0, max(by_day) + 7):
        users = set()
        for back in range(7):
            users |= by_day.get(d - back, set())
        if users:
            want[str((base + datetime.timedelta(days=d)).date())] = len(users)
    assert got == want


# --- round-8 operators: span scrub + SQ8, pure-Python references -------------


def _scrub_ref(docs: list[str], n: int):
    """Independent reference for dup_span_scrub over already-normalized
    (lowercase, single-space) texts."""
    toks = {i: (t.split() if t.strip() else []) for i, t in enumerate(docs)}
    posts: dict[str, list[tuple[int, int]]] = {}
    for i, ts in toks.items():
        for s in range(len(ts) - n + 1):
            posts.setdefault(" ".join(ts[s : s + n]), []).append((i, s))
    dup_keeper = {
        g: min(d for d, _ in occ)
        for g, occ in posts.items()
        if len({d for d, _ in occ}) >= 2
    }
    out = {}
    for i, ts in toks.items():
        covered = set()
        for s in range(len(ts) - n + 1):
            g = " ".join(ts[s : s + n])
            if g in dup_keeper and dup_keeper[g] != i:
                covered.update(range(s, s + n))
        kept = [t for p, t in enumerate(ts) if p not in covered]
        out[i] = (len(ts), len(kept), len(ts) - len(kept), " ".join(kept))
    return out


@SETTINGS
@given(docs=corpus)
def test_dup_span_scrub_matches_python_reference(spark, docs):
    from proyecto_gasto_publico_etl_per__spark.operators import dedup

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id LONG, text STRING"
    )
    n = 2  # short grams so duplication actually occurs on tiny corpora
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.n_dup_tokens, r.text_scrubbed)
        for r in dedup.dup_span_scrub(df, n=n).collect()
    }
    assert got == _scrub_ref(docs, n)


vec = st.lists(
    st.floats(
        min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
    ),
    min_size=4,
    max_size=4,
)


@SETTINGS
@given(vecs=st.lists(vec, min_size=1, max_size=12))
def test_sq8_codes_match_python_reference(spark, vecs):
    """SQ8 codes are the SAME IEEE expression in Python and Spark —
    exact integer equality, plus the midpoint-reconstruction error
    bound ≤ half a cell for in-range values."""
    import math

    from proyecto_gasto_publico_etl_per__spark.operators import similarity

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    minmax = similarity.sq8_minmax(df)
    dims = list(zip(*vecs))
    assert minmax == [(min(d), max(d)) for d in dims]

    def code_ref(x, mn, mx):
        if not mx > mn:
            return 0
        return max(0, min(255, math.floor((x - mn) / (mx - mn) * 256.0)))

    got = {r.vec_id: list(r.codes) for r in similarity.sq8_encode(df).collect()}
    for i, v in enumerate(vecs):
        expect = [code_ref(x, mn, mx) for x, (mn, mx) in zip(v, minmax)]
        assert got[i] == expect
        # midpoint reconstruction: within half a cell on live dims.
        # The half-cell bound is exact in REAL arithmetic; the computed
        # dq expression rounds at ulp(mn)-scale, which dominates when
        # the dim's RANGE is billions of times smaller than its
        # magnitude (hypothesis round 12: two denormal-boundary floats
        # 1.7e-48 apart at 1.2e-38 — excess ~30 ulp) — so the bound
        # carries an explicit few-ulp absolute slack, not just a
        # relative one.
        for x, c, (mn, mx) in zip(v, expect, minmax):
            if mx > mn:
                dq = mn + (c + 0.5) * (mx - mn) / 256.0
                slack = 64.0 * math.ulp(max(abs(mn), abs(mx)))
                assert abs(x - dq) <= (mx - mn) / 512.0 * (1 + 1e-9) + slack
