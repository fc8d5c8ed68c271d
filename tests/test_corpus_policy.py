"""Corpus-policy operators (operators/corpus.py) cross-checked against
DuckDB recomputations on the driver testdata plus hand-built PII
fixtures: repetition fractions, PII count/redaction, benchmark
decontamination, and deterministic hash sampling (determinism, rate,
and plan shape — the sample filter must not introduce an Exchange).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bigsdb_spark.operators.corpus import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    benchmark_ngram_hits,
    decontaminate,
    dup_ngram_char_fraction,
    gopher_repetition_flags,
    hash_sample,
    pii_counts,
    redact_pii,
    stratified_sample,
    temperature_weights,
    top_ngram_char_fraction,
    word_ngram_array,
)
from bigsdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def _duck(sql):
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _frac_sql(n: int) -> str:
    last = n - 1
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               length(replace(text, ' ', '')) AS chars
        FROM documents),
    grams AS (
        SELECT doc_id, chars,
               array_to_string(list_slice(t, CAST(u.i AS INT),
                                          CAST(u.i + {last} AS INT)), ' ') AS gram
        FROM toks, UNNEST(range(1, len(t) - {last} + 1)) AS u(i)),
    cnt AS (
        SELECT doc_id, chars, gram, count(*) AS c,
               length(replace(gram, ' ', '')) AS gc
        FROM grams GROUP BY 1, 2, 3),
    top AS (SELECT doc_id, max(c * gc) AS topw,
                   sum(CASE WHEN c >= 2 THEN c * gc ELSE 0 END) AS dupw
            FROM cnt GROUP BY 1)
    SELECT tk.doc_id,
           CASE WHEN chars > 0
                THEN least(1.0, round(coalesce(topw, 0) / chars, 6)) ELSE 0.0 END,
           CASE WHEN chars > 0
                THEN least(1.0, round(coalesce(dupw, 0) / chars, 6)) ELSE 0.0 END
    FROM toks tk LEFT JOIN top ON top.doc_id = tk.doc_id
    """


def test_repetition_fractions_match_duckdb(spark, docs):
    top2 = {
        r["doc_id"]: r["frac"]
        for r in top_ngram_char_fraction(docs, "doc_id", "text", 2).collect()
    }
    dup5 = {
        r["doc_id"]: r["frac"]
        for r in dup_ngram_char_fraction(docs, "doc_id", "text", 5).collect()
    }
    exp2 = {d: (t, u) for d, t, u in _duck(_frac_sql(2))}
    exp5 = {d: (t, u) for d, t, u in _duck(_frac_sql(5))}
    assert set(top2) == set(exp2) and set(dup5) == set(exp5)
    for d in top2:
        assert abs(top2[d] - exp2[d][0]) <= 1e-6, d
        assert abs(dup5[d] - exp5[d][1]) <= 1e-6, d


def test_repetition_flags_compose(spark, docs):
    flags = gopher_repetition_flags(docs, "doc_id", "text").collect()
    assert len(flags) == docs.count()
    for r in flags:
        expected = int(r["top2_frac"] <= 0.20 and r["dup5_frac"] <= 0.15)
        assert r["rep_ok"] == expected
    # the single-pass flags must agree with the independent
    # single-metric operators (different plan, same values)
    top2 = {
        r["doc_id"]: r["frac"]
        for r in top_ngram_char_fraction(docs, "doc_id", "text", 2).collect()
    }
    dup5 = {
        r["doc_id"]: r["frac"]
        for r in dup_ngram_char_fraction(docs, "doc_id", "text", 5).collect()
    }
    for r in flags:
        assert r["top2_frac"] == top2[r["doc_id"]]
        assert r["dup5_frac"] == dup5[r["doc_id"]]


PII_FIXTURE = [
    (1, "reach me at alice.smith+work@example.co.uk or 10.0.42.7 thanks"),
    (2, "call 555-123-4567 or 555-987-6543 (backup bob@corp.io)"),
    (3, "no pii here, just 1.2 version numbers and a dot."),
    (4, "two mails a@b.com c.d@e.org one ip 192.168.0.1 one phone 111-222-3333"),
]


def test_pii_counts_match_duckdb(spark):
    df = spark.createDataFrame(PII_FIXTURE, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_counts(df, "doc_id", "text").collect()}
    con = duckdb.connect()
    for doc_id, text in PII_FIXTURE:
        e, i, p = con.execute(
            "SELECT len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),"
            " len(regexp_extract_all(?, ?))",
            [text, EMAIL_RE, text, IPV4_RE, text, PHONE_RE],
        ).fetchone()
        assert got[doc_id]["n_email"] == e, doc_id
        assert got[doc_id]["n_ipv4"] == i, doc_id
        assert got[doc_id]["n_phone"] == p, doc_id
    con.close()
    # sanity anchors (catch a regex that matches nothing everywhere)
    assert got[1]["n_email"] == 1 and got[1]["n_ipv4"] == 1
    assert got[2]["n_phone"] == 2 and got[4]["n_email"] == 2


def test_redact_pii_matches_duckdb_and_is_clean(spark):
    df = spark.createDataFrame(PII_FIXTURE, "doc_id long, text string")
    red = df.select("doc_id", redact_pii(F.col("text")).alias("red"))
    got = {r["doc_id"]: r["red"] for r in red.collect()}
    con = duckdb.connect()
    for doc_id, text in PII_FIXTURE:
        (exp,) = con.execute(
            "SELECT regexp_replace(regexp_replace(regexp_replace("
            "?, ?, '[EMAIL]', 'g'), ?, '[PHONE]', 'g'), ?, '[IP]', 'g')",
            [text, EMAIL_RE, PHONE_RE, IPV4_RE],
        ).fetchone()
        assert got[doc_id] == exp, doc_id
    con.close()
    # redacted text carries no residual PII
    residual = pii_counts(
        red.withColumnRenamed("red", "text"), "doc_id", "text"
    ).agg(F.sum(F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))).head()[0]
    assert residual == 0


def test_decontamination_matches_duckdb(spark, docs):
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    hits = benchmark_ngram_hits(docs, bench, "doc_id", "text", n=5)
    got = {r["doc_id"]: r["n_hits"] for r in hits.collect()}
    exp = dict(
        _duck("""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        grams AS (
            SELECT doc_id,
                   array_to_string(list_slice(t, CAST(u.i AS INT),
                                              CAST(u.i + 4 AS INT)), ' ') AS gram
            FROM toks, UNNEST(range(1, len(t) - 4 + 1)) AS u(i)),
        dg AS (SELECT DISTINCT doc_id, gram FROM grams),
        bg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 40 = 0)
        SELECT dg.doc_id, count(*) FROM dg JOIN bg ON bg.gram = dg.gram
        GROUP BY 1
        """)
    )
    assert got == exp
    # benchmark members are fully self-contaminated and get scrubbed
    bench_ids = {r["doc_id"] for r in bench.collect()}
    assert bench_ids <= set(got)
    clean = decontaminate(docs, bench, "doc_id", "text", n=5)
    clean_ids = {r["doc_id"] for r in clean.collect()}
    assert clean_ids == {
        r["doc_id"] for r in docs.collect()
    } - set(got)


def test_ngram_array_short_docs_empty(spark):
    df = spark.createDataFrame([("a b",), ("a",), ("",)], "text string")
    rows = df.select(F.size(word_ngram_array(F.col("text"), 3)).alias("n")).collect()
    assert [r["n"] for r in rows] == [0, 0, 0]


def test_hash_sample_deterministic_rate_and_plan(spark, docs):
    s1 = hash_sample(docs, "doc_id", 0.3, seed=7)
    s2 = hash_sample(docs, "doc_id", 0.3, seed=7)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())
    n, total = len(ids1), docs.count()
    assert 0.15 <= n / total <= 0.45  # 500 docs — loose binomial band
    # different seed -> different (deterministic) subset
    ids3 = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=8).collect())
    assert ids3 != ids1
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter: no shuffle introduced


def test_stratified_sample_rates_per_stratum(spark):
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("stratum"),
    )
    out = stratified_sample(df, "stratum", "k", {"s0": 0.5, "s1": 0.05}, seed=3)
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert 4500 <= counts["s0"] <= 5500  # 10k keys at 50%
    assert 300 <= counts["s1"] <= 700  # 10k keys at 5%
    # unknown stratum with default_rate=0 drops everything
    df2 = df.withColumn("stratum", F.lit("s9"))
    assert stratified_sample(df2, "stratum", "k", {"s0": 0.5}).count() == 0


def test_temperature_weights_normalize(spark):
    counts = spark.createDataFrame(
        [("web", 1000000), ("books", 10000), ("code", 90000)],
        "source string, n long",
    )
    w = {r["source"]: r["weight"] for r in temperature_weights(counts, "source", "n", 0.5).collect()}
    z = 1000000**0.5 + 10000**0.5 + 90000**0.5
    for src, n in [("web", 1000000), ("books", 10000), ("code", 90000)]:
        assert abs(w[src] - n**0.5 / z) <= 1e-6
    assert abs(sum(w.values()) - 1.0) <= 2e-6
    # flattening: alpha<1 upweights small sources vs their raw share
    assert w["books"] > 10000 / 1100000


def test_canonical_url_and_domain(spark):
    from bigsdb_spark.operators.corpus import canonical_url, url_domain

    rows = [
        ("HTTPS://WWW.Example.COM:443/Path/Page?utm_source=x&q=1#frag",),
        ("http://example.com/Path/Page?q=1",),
        ("https://news.sub.example.co/a/b/",),
        ("example.com/Path/Page?q=1",),
    ]
    df = spark.createDataFrame(rows, "url string")
    out = df.select(
        canonical_url(F.col("url")).alias("canon"),
        url_domain(F.col("url")).alias("dom"),
    ).collect()
    # scheme/www/port/fragment/tracking params all stripped; the three
    # spellings of the same page collapse to one canonical key
    assert out[0]["canon"] == out[1]["canon"] == out[3]["canon"] == "example.com/Path/Page?q=1"
    assert out[2]["canon"] == "news.sub.example.co/a/b"
    assert out[0]["dom"] == "example.com"
    assert out[2]["dom"] == "example.co"


def test_cap_per_domain(spark):
    from bigsdb_spark.operators.corpus import cap_per_domain

    rows = [(i, "spam.com" if i < 8 else "rare.org", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, quality double")
    capped = cap_per_domain(
        df, "domain", n_max=3, order_by=[F.desc("quality")]
    )
    got = {}
    for r in capped.collect():
        got.setdefault(r["domain"], []).append(r["doc_id"])
    # quality-desc keeps the best 3 spam docs; rare domain untouched
    assert sorted(got["spam.com"]) == [5, 6, 7]
    assert sorted(got["rare.org"]) == [8, 9]
    # deterministic under re-run
    again = cap_per_domain(df, "domain", n_max=3, order_by=[F.desc("quality")])
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, again.collect()))


def test_repeated_spans_cross_document(spark):
    """Lee-et-al-style substring dedup: a shared >=min_gram-token
    passage across two docs is flagged with exact token offsets and
    merged into ONE maximal span; unique text and self-repetition
    (one doc) are not flagged."""
    from bigsdb_spark.operators.corpus import (
        repeated_spans,
        strip_repeated_spans,
    )

    shared = " ".join(f"s{i}" for i in range(12))        # 12 shared tokens
    doc1 = "alpha beta " + shared + " gamma"             # span at 3..14
    doc2 = "x " + shared + " y z"                        # span at 2..13
    doc3 = "totally unique words only here nothing shared at all today"
    selfrep = " ".join(["r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 r11 r12"] * 2)
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3), (4, selfrep)],
        "doc_id long, text string",
    )
    spans = repeated_spans(df, "doc_id", "text", min_gram=10, min_docs=2)
    got = {
        r["doc_id"]: (r["start_tok"], r["end_tok"]) for r in spans.collect()
    }
    # doc1: shared tokens occupy positions 3..14; three overlapping
    # 10-gram hits (3, 4, 5) merge to one span 3..14
    assert got[1] == (3, 14)
    assert got[2] == (2, 13)
    assert 3 not in got and 4 not in got
    assert spans.count() == 2  # one maximal span per doc, never split
    # stripping removes exactly the shared passage
    clean = {
        r["doc_id"]: r["clean_text"]
        for r in strip_repeated_spans(df, spans, "doc_id", "text").collect()
    }
    assert clean[1] == "alpha beta gamma"
    assert clean[2] == "x y z"
    assert clean[3] == doc3 and clean[4] == selfrep  # untouched


@pytest.mark.slow
def test_dsir_importance_resampling(spark):
    """DSIR (Xie et al. 2023): the fitted bucket log-ratios match an
    independent pure-Python computation, per-doc scores are the sum of
    their gram-bucket ratios, target-like docs outscore off-domain
    docs, and Gumbel top-k is deterministic, rank-complete, and
    weight-respecting."""
    import hashlib
    import math

    from bigsdb_spark.operators.corpus import (
        dsir_log_ratios,
        dsir_scores,
        gumbel_topk,
        hashed_gram_buckets,
    )

    B = 64
    rows = [
        (0, "spark join shuffle join spark"),     # target-like
        (1, "spark join shuffle batch plan"),     # target-like
        (2, "cat dog bird fish cow"),             # off-domain
        (3, "cat dog horse goat pig"),            # off-domain
        (4, "spark join shuffle cow pig"),        # mixed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    grams = hashed_gram_buckets(df, "doc_id", "text", buckets=B)

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B

    # python reference: every uni- and bi-gram instance, hashed
    py_grams = []
    for doc_id, text in rows:
        t = text.split(" ")
        gs = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        py_grams.extend((doc_id, bucket(g)) for g in gs)
    got = sorted((r["doc_id"], r["bucket"]) for r in grams.collect())
    assert got == sorted(py_grams)

    target_ids = {0, 1}
    target = df.filter(df.doc_id < 2).select("doc_id")
    ratios = dsir_log_ratios(grams, target, "doc_id", buckets=B)
    craw, ctgt = {}, {}
    for doc_id, b in py_grams:
        craw[b] = craw.get(b, 0) + 1
        if doc_id in target_ids:
            ctgt[b] = ctgt.get(b, 0) + 1
    nraw, ntgt = len(py_grams), sum(ctgt.values())
    expect = {
        b: math.log((ctgt.get(b, 0) + 1) / (ntgt + B))
        - math.log((craw[b] + 1) / (nraw + B))
        for b in craw
    }
    got_r = {r["bucket"]: r["log_ratio"] for r in ratios.collect()}
    assert set(got_r) == set(expect)
    for b in expect:
        assert abs(got_r[b] - expect[b]) < 1e-12

    scored = dsir_scores(grams, ratios, "doc_id")
    got_w = {r["doc_id"]: r["dsir_logw"] for r in scored.collect()}
    py_w = {}
    for doc_id, b in py_grams:
        py_w[doc_id] = py_w.get(doc_id, 0.0) + expect[b]
    for d in py_w:
        assert abs(got_w[d] - py_w[d]) < 1e-10
    # in-domain docs must outscore off-domain docs
    assert min(got_w[0], got_w[1]) > max(got_w[2], got_w[3])
    assert got_w[2] < got_w[4] < got_w[0]

    sel = gumbel_topk(scored, "doc_id", "dsir_logw", k=3, seed="s")
    out = sel.collect()
    assert len(out) == 3
    assert sorted(r["sel_rank"] for r in out) == [1, 2, 3]
    # deterministic: a second run (and a repartitioned input) selects
    # the identical sample in the identical order
    again = gumbel_topk(
        scored.repartition(7), "doc_id", "dsir_logw", k=3, seed="s"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # weight-respecting: boost one doc's score far above the rest and
    # it must enter every sample regardless of seed
    boosted = scored.withColumn(
        "dsir_logw",
        F.when(F.col("doc_id") == 3, F.lit(500.0)).otherwise(F.col("dsir_logw")),
    )
    for seed in ["a", "b", "c"]:
        picked = {
            r["doc_id"]
            for r in gumbel_topk(
                boosted, "doc_id", "dsir_logw", k=2, seed=seed
            ).collect()
        }
        assert 3 in picked


def test_dsir_xxhash64_family_equivalent_model_shape(spark):
    """The xxhash64 serving family yields the same gram-instance
    multiset size per doc (bucket values differ by design), valid
    bucket range, and an end-to-end pipeline whose in-domain docs
    still outscore off-domain docs."""
    from bigsdb_spark.operators.corpus import (
        dsir_log_ratios,
        dsir_scores,
        hashed_gram_buckets,
    )

    rows = [
        (0, "spark join shuffle join spark"),
        (1, "spark join shuffle batch plan"),
        (2, "cat dog bird fish cow"),
        (3, "cat dog horse goat pig"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g_md5 = hashed_gram_buckets(df, "doc_id", "text", buckets=64)
    g_xx = hashed_gram_buckets(
        df, "doc_id", "text", buckets=64, hash_family="xxhash64"
    )
    per_doc = lambda g: dict(  # noqa: E731
        (r["doc_id"], r["n"])
        for r in g.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    )
    assert per_doc(g_md5) == per_doc(g_xx)
    assert g_xx.filter("bucket < 0 OR bucket >= 64").count() == 0
    target = df.filter("doc_id < 2").select("doc_id")
    ratios = dsir_log_ratios(g_xx, target, "doc_id", buckets=64)
    w = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_scores(g_xx, ratios, "doc_id").collect()
    }
    assert min(w[0], w[1]) > max(w[2], w[3])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_family"):
        hashed_gram_buckets(df, "doc_id", "text", hash_family="sha1")
