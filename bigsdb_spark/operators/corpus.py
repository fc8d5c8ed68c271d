"""Corpus-policy operators for training-data pipelines: repetition
quality filters, PII detection/redaction, benchmark decontamination,
and deterministic sampling/mixing.

All hot paths are JVM-side expressions or hash equi-joins:

- repetition stats explode word n-grams and aggregate per document —
  one shuffle on (doc, gram), map-side combinable, linear in corpus
  size (the Gopher-style repetition filters of Rae et al. 2021 §A1.1,
  re-expressed relationally; thresholds differ — see
  ``gopher_repetition_flags``);
- PII counting/redaction is ``regexp_count``/``regexp_replace`` —
  pure codegen expressions, zero shuffle;
- decontamination is the standard train/test n-gram-overlap scrub
  (as published for GPT-3/Llama dataset preparation): distinct
  benchmark n-grams equi-joined against document n-grams. The
  benchmark side is tiny relative to the corpus, so Spark broadcasts
  it and the scan stays one pass over the corpus;
- sampling is deterministic hashing (xxhash64) — no shuffle, no RNG
  state, reproducible across runs and executors, and stable under
  repartitioning (the property driver-side ``df.sample`` lacks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# word n-grams (whitespace tokens — the corpus-policy family works on
# the raw text spelling; the dedup family's normalized_text shingles
# stay separate because policy filters must see original casing /
# punctuation)


def word_tokens(text_col: Column) -> Column:
    return F.split(text_col, " ")


def word_ngram_array(text_col: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty when the document has
    fewer than ``n`` tokens (guarded — F.sequence(1, 0) would produce a
    DESCENDING [1, 0]).

    The token array is bound to a lambda VARIABLE via a one-element
    wrapper transform: a lambda that closed over the raw ``split``
    expression would re-tokenize the whole document per n-gram after
    projection collapse (the word_shingles/lm.py quadratic trap);
    a lambda variable is evaluated once per row by contract."""
    per_doc = F.transform(
        F.array(word_tokens(text_col)),
        lambda toks: F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return F.element_at(per_doc, 1)


def _gram_counts(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram, cnt, gram_chars) — one explode + one combinable
    groupBy; gram_chars excludes the joining spaces."""
    ex = df.select(
        F.col(id_col),
        F.explode(word_ngram_array(F.col(text_col), n)).alias("gram"),
    )
    return ex.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first(F.length(F.regexp_replace("gram", " ", ""))).alias("gram_chars"),
    )


def _doc_chars(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.length(F.regexp_replace(F.col(text_col), " ", "")).alias("_chars"),
    )


def top_ngram_char_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Per document: (occurrences x characters) of the heaviest word
    n-gram, as a fraction of the document's non-space characters
    (the max is over cnt*chars directly, so ties need no ordering
    tiebreak). Documents with fewer than ``n`` tokens score 0.0;
    overlapping occurrences can overcount characters, so the value
    saturates at 1.0.

    Returns (id, frac) with frac rounded to 6dp.
    """
    heaviest = (
        _gram_counts(df, id_col, text_col, n)
        .groupBy(id_col)
        .agg(F.max(F.col("cnt") * F.col("gram_chars")).alias("_top"))
    )
    return (
        _doc_chars(df, id_col, text_col)
        .join(heaviest, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.when(
                F.col("_chars") > 0,
                F.least(
                    F.lit(1.0),
                    F.round(
                        F.coalesce(F.col("_top"), F.lit(0)) / F.col("_chars"), 6
                    ),
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("frac"),
        )
    )


def dup_ngram_char_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Per document: characters inside word n-grams that occur more than
    once, as a fraction of non-space characters (every occurrence of a
    repeated gram counts — the relational analogue of the duplicated
    n-gram filters; overlap-free span accounting would need a
    sequential pass and changes thresholds, not ordering). Saturates at
    1.0 for the same reason as top_ngram_char_fraction.

    Returns (id, frac), 6dp.
    """
    dup = (
        _gram_counts(df, id_col, text_col, n)
        .filter(F.col("cnt") >= 2)
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("gram_chars")).alias("_dup"))
    )
    return (
        _doc_chars(df, id_col, text_col)
        .join(dup, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.when(
                F.col("_chars") > 0,
                F.least(
                    F.lit(1.0),
                    F.round(
                        F.coalesce(F.col("_dup"), F.lit(0)) / F.col("_chars"), 6
                    ),
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("frac"),
        )
    )


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_top2_frac: float = 0.20,
    max_dup5_frac: float = 0.15,
) -> DataFrame:
    """Both repetition fractions + the keep/drop flag in ONE pass:
    2-grams and 5-grams are tagged and exploded together, so the corpus
    is scanned once and pays one (doc, n, gram) combine + one per-doc
    aggregate instead of two full explode/aggregate/join pipelines
    (composing top_ngram_char_fraction ⋈ dup_ngram_char_fraction was
    measured ~2x this cost at sf0.1; those stay as the independent
    single-metric operators and as the cross-check in tests).
    Returns (id, top2_frac, dup5_frac, rep_ok)."""
    t = F.col(text_col)
    tagged = F.concat(
        F.transform(
            word_ngram_array(t, 2),
            lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
        ),
        F.transform(
            word_ngram_array(t, 5),
            lambda g: F.struct(F.lit(5).alias("n"), g.alias("gram")),
        ),
    )
    ex = df.select(F.col(id_col), F.explode(tagged).alias("ng")).select(
        id_col, F.col("ng.n").alias("n"), F.col("ng.gram").alias("gram")
    )
    cnt = ex.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first(F.length(F.regexp_replace("gram", " ", ""))).alias("gc"),
    )
    per = cnt.groupBy(id_col).agg(
        F.max(F.when(F.col("n") == 2, F.col("cnt") * F.col("gc"))).alias("_top"),
        F.sum(
            F.when(
                (F.col("n") == 5) & (F.col("cnt") >= 2),
                F.col("cnt") * F.col("gc"),
            )
        ).alias("_dup"),
    )

    def _frac(raw):
        # least(1.0, ...): overlapping occurrences of a repeated gram
        # overcount characters, so the raw ratio can exceed 1 ('a a a'
        # has two overlapping identical 2-grams covering 4 gram-chars
        # over 3 text-chars); saturate so the value stays a fraction
        return (
            F.when(
                F.col("_chars") > 0,
                F.least(
                    F.lit(1.0),
                    F.round(F.coalesce(raw, F.lit(0)) / F.col("_chars"), 6),
                ),
            )
            .otherwise(F.lit(0.0))
        )

    return (
        _doc_chars(df, id_col, text_col)
        .join(per, on=id_col, how="left")
        .select(
            F.col(id_col),
            _frac(F.col("_top")).alias("top2_frac"),
            _frac(F.col("_dup")).alias("dup5_frac"),
        )
        .withColumn(
            "rep_ok",
            (
                (F.col("top2_frac") <= max_top2_frac)
                & (F.col("dup5_frac") <= max_dup5_frac)
            ).cast("int"),
        )
    )


# ---------------------------------------------------------------------------
# PII — regex patterns shared verbatim with the DuckDB oracle (both
# engines speak this subset identically; no backrefs, no lookarounds)

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b"
PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"


def pii_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone) — regexp_count expressions, one
    scan, no shuffle."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phone"),
    )


def redact_pii(text_col: Column) -> Column:
    """Replace emails -> [EMAIL], phones -> [PHONE], IPv4 -> [IP].
    Email first (its local part may contain digit runs), then the more
    specific phone shape, then bare IPs — a fixed order so redaction is
    deterministic."""
    out = F.regexp_replace(text_col, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, PHONE_RE, "[PHONE]")
    return F.regexp_replace(out, IPV4_RE, "[IP]")


# ---------------------------------------------------------------------------
# decontamination


def benchmark_ngram_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Documents sharing at least one word ``n``-gram with the benchmark
    set -> (id, n_hits) where n_hits counts DISTINCT contaminated grams
    (occurrence multiplicity is irrelevant to the keep/drop decision).

    Plan shape: distinct benchmark grams (small — benchmarks are a few
    thousand documents against a multi-billion-document corpus)
    BROADCAST against the raw exploded corpus grams, so the corpus side
    never shuffles before the match: the join prunes to the (tiny)
    contaminated set map-side, and only that set pays the distinct +
    count shuffle. (Deduplicating the corpus grams BEFORE the join —
    the obvious spelling — costs a full corpus-wide shuffle and was
    measured 4x slower at sf0.1; set ``broadcast_benchmark=False`` for
    a benchmark too large to broadcast, where AQE picks the strategy.)
    """
    bcol = bench_text_col or text_col
    bench_grams = benchmark.select(
        F.explode(word_ngram_array(F.col(bcol), n)).alias("gram")
    ).distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_ngram_array(F.col(text_col), n)).alias("gram"),
    )
    return (
        doc_grams.join(bench_grams, on="gram")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Drop documents with >= min_hits contaminated n-grams (left-anti
    join against the hit list)."""
    hits = benchmark_ngram_hits(
        docs, benchmark, id_col, text_col, bench_text_col, n
    ).filter(F.col("n_hits") >= min_hits)
    return docs.join(hits.select(id_col), on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# deterministic sampling / corpus mixing

_BUCKETS = 1_000_000


def hash_sample(df: DataFrame, key_col: str, rate: float, seed: int = 0) -> DataFrame:
    """Keep ~rate of rows by hashing the key — deterministic (same rows
    every run and after any repartition), no shuffle, no RNG state; the
    sampling decision is a pure filter expression so it pushes into the
    scan stage."""
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_BUCKETS))
    # round, not int(): 0.3 * 1e6 is 299999.99999999994 — truncation
    # would permanently exclude the boundary bucket from the sample
    return df.filter(bucket < round(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: dict,
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum hash sampling with a literal rate map — the corpus
    mixing primitive (e.g. downsample web text, keep all reference
    text). Still a single filter expression: no shuffle, no join."""
    pairs = []
    for k, v in rates.items():
        pairs.extend([F.lit(k), F.lit(round(v * _BUCKETS))])
    limit = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(round(default_rate * _BUCKETS)),
    )
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_BUCKETS))
    return df.filter(bucket < limit)


def temperature_weights(
    counts: DataFrame, group_col: str, n_col: str, alpha: float = 0.5
) -> DataFrame:
    """Temperature-based mixture weights w_i = n_i^alpha / sum(n^alpha)
    (the multilingual/multi-source sampling scheme of the XLM-R /
    multilingual-BERT lineage). ``counts`` is one row per source —
    dimension-sized — so the normalizer is a singleton aggregate
    cross-joined back (broadcast)."""
    powed = counts.select(
        F.col(group_col), F.pow(F.col(n_col), F.lit(alpha)).alias("_p")
    )
    total = powed.agg(F.sum("_p").alias("_z"))
    return powed.crossJoin(F.broadcast(total)).select(
        F.col(group_col),
        F.round(F.col("_p") / F.col("_z"), 6).alias("weight"),
    )


# ------------------------------------------------- URL / domain policy

def canonical_url(url_col: Column) -> Column:
    """Canonicalize a URL for dedup keys (the standard web-corpus
    normalization): lowercase scheme+host, strip the scheme, a leading
    ``www.``, the fragment, common tracking query params (utm_*,
    fbclid, gclid), a trailing ``?`` left by the strip, trailing
    slashes, and default ports.  Pure expressions — safe in a 100 TB
    scan's projection."""
    u = F.trim(url_col)
    u = F.regexp_replace(u, r"^[Hh][Tt][Tt][Pp][Ss]?://", "")
    u = F.regexp_replace(u, r"#.*$", "")
    # drop tracking params wherever they sit in the query string
    u = F.regexp_replace(u, r"([?&])(utm_[a-z]+|fbclid|gclid)=[^&]*", "$1")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    # lowercase ONLY the authority part; path/query stay case-sensitive
    host = F.lower(F.regexp_extract(u, r"^([^/]*)", 1))
    rest = F.regexp_replace(u, r"^[^/]*", "")
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    return F.regexp_replace(F.concat(host, rest), r"/+$", "")


def url_domain(url_col: Column) -> Column:
    """Registrable-ish domain of a URL: the canonical host minus any
    leading subdomains beyond the last two labels (a heuristic — a
    public-suffix list is the full-fidelity swap-in)."""
    host = F.lower(
        F.regexp_extract(
            F.regexp_replace(F.trim(url_col), r"^[Hh][Tt][Tt][Pp][Ss]?://", ""),
            r"^([^/:?#]*)",
            1,
        )
    )
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    n_max: int,
    order_by: list | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``n_max`` documents per domain — the anti-spam /
    diversity cap every web-corpus policy applies (a single host must
    not dominate the mixture).  Ranking inside each domain follows
    ``order_by`` (e.g. quality desc) with the id as tiebreak, so the
    cap is deterministic; one window over the domain key, map-side
    combinable nowhere (a cap is inherently per-group), but the window
    partitions by domain so skew lands on AQE's plate."""
    from pyspark.sql import Window

    order = list(order_by) if order_by else []
    order.append(F.asc(id_col))
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_max)
        .drop("_rk")
    )


# ---------------------------------------------------------------------------
# cross-document repeated substrings (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better": remove substrings of
# >= ~50 tokens that repeat across the corpus — doc-level dedup misses
# them).  The published exact method builds a corpus-wide suffix
# array, a global sequential structure; here the same repeats are
# found RELATIONALLY: hash every length-n token window, keep hashes
# seen in >= min_docs distinct documents, and merge each document's
# overlapping hit windows into maximal spans.  One explode + one
# combinable groupBy + one window — linear in corpus tokens, no
# global structure.  xxhash64 over the token-slice ARRAY (never a
# joined string) keeps the shuffled key 8 bytes; a hash collision can
# over-mark with probability ~2^-64 per window pair — the accepted
# trade for staying distributed.


def repeated_span_hits(
    df: DataFrame, id_col: str, text_col: str, min_gram: int = 50
) -> DataFrame:
    """(id, pos, h): the 1-based token position and hash of every
    length-``min_gram`` window.  Token array bound to a lambda
    variable (the word_ngram_array trap note)."""
    per_doc = F.transform(
        F.array(word_tokens(F.col(text_col))),
        lambda toks: F.when(
            F.size(toks) >= min_gram,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (min_gram - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.xxhash64(F.slice(toks, i, min_gram)).alias("h"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<pos:int,h:bigint>>")
        ),
    )
    return df.select(
        F.col(id_col), F.explode(F.element_at(per_doc, 1)).alias("w")
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_gram: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """(id, start_tok, end_tok) — maximal 1-based token spans covered
    by windows whose hash occurs in >= ``min_docs`` DISTINCT documents
    (self-repetition within one doc is the Gopher filters' job, so the
    threshold counts documents, not occurrences).  Overlapping or
    adjacent hit windows merge: a new span starts only when the next
    hit begins beyond the previous window's reach (gap > min_gram)."""
    from pyspark.sql import Window

    hits = repeated_span_hits(df, id_col, text_col, min_gram)
    rep = (
        hits.groupBy("h")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("h")
    )
    marked = hits.join(rep, "h", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = marked.withColumn(
        "_new",
        (
            F.col("pos")
            > F.coalesce(F.lag("pos").over(w), F.lit(-min_gram))
            + min_gram
        ).cast("int"),
    ).withColumn("_span", F.sum("_new").over(w))
    return (
        flagged.groupBy(id_col, "_span")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + min_gram - 1).alias("end_tok"),
        )
        .drop("_span")
    )


def strip_repeated_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove every flagged span's tokens and rejoin the rest — pure
    expressions over the per-doc span list (broadcast-sized per row:
    spans per doc are few by construction).  Docs with no spans pass
    through unchanged."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_spans")
    )
    joined = df.join(sp, id_col, "left").withColumn(
        "_spans",
        F.coalesce(
            F.col("_spans"),
            F.array().cast("array<struct<start_tok:bigint,end_tok:bigint>>"),
        ),
    )
    kept = F.element_at(
        F.transform(
            F.array(word_tokens(F.col(text_col))),
            lambda toks: F.filter(
                F.transform(
                    toks,
                    lambda t, i0: F.struct(t.alias("t"), (i0 + 1).alias("p")),
                ),
                lambda s: ~F.exists(
                    F.col("_spans"),
                    lambda sp_: (s["p"] >= sp_["start_tok"])
                    & (s["p"] <= sp_["end_tok"]),
                ),
            ),
        ),
        1,
    )
    return joined.withColumn(
        out_col, F.array_join(F.transform(kept, lambda s: s["t"]), " ")
    ).drop("_spans")


# ------------------------------------------- DSIR importance resampling
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw document by how target-like its
# hashed n-gram distribution is (log p_target/p_raw under two hashed
# bag-of-ngrams models), then sample the keep-set with the Gumbel
# top-k trick so selection is a weighted sample WITHOUT replacement.
# The reference engine has no counterpart (its datasets are curated
# registries, not crawled corpora); this is the corpus-mixing stage a
# 100 TB training pipeline runs between policy filtering and packing.
#
# Scale shape: the FIT is two combinable groupBys that collapse to at
# most ``buckets`` rows (map-side partial aggregation makes the
# shuffle ~buckets rows per partition, independent of corpus size);
# the SCORE is one explode + one broadcast join against the
# bucket-ratio table + one per-doc re-agg whose partial agg collapses
# to one row per (partition, doc) — a doc's grams never leave their
# partition before combining; SELECTION is orderBy+limit, which Spark
# plans as TakeOrderedAndProject (per-partition top-k, then a k-row
# merge on the driver side of the exchange — never a global sort).
# The md5-derived bucket hash is deliberately engine-portable so the
# whole pipeline (fit included) is value-checkable in DuckDB.


def hashed_gram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 256,
    hash_family: str = "md5",
) -> DataFrame:
    """(id, bucket) — one row per word uni-/bi-gram INSTANCE, hashed
    into ``buckets`` buckets.  ``hash_family``:

    * ``md5`` (default): first 4 hex chars of md5(gram) mod buckets —
      engine-portable (DuckDB reproduces it digit-by-digit), so the
      whole DSIR pipeline including the fit is oracle-checkable;
      ``buckets`` <= 65536.
    * ``xxhash64``: JVM-native hashing for serving (~same model
      quality, bucket values engine-specific) — the same
      gate-vs-serving split as the minhash signature family.

    A model is only valid with scores from the SAME family (bucket
    ids differ across families); the DSIR paper uses 10k buckets."""
    if hash_family not in ("md5", "xxhash64"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    if hash_family == "md5" and not 1 <= buckets <= 65536:
        raise ValueError("buckets must be in [1, 65536] for md5")
    grams = F.concat(
        word_ngram_array(F.col(text_col), 1), word_ngram_array(F.col(text_col), 2)
    )
    ex = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    if hash_family == "md5":
        bucket = F.pmod(
            F.conv(F.substring(F.md5(F.col("gram")), 1, 4), 16, 10).cast("long"),
            F.lit(buckets),
        )
    else:
        bucket = F.pmod(F.xxhash64(F.col("gram")), F.lit(buckets))
    return ex.select(id_col, bucket.cast("int").alias("bucket"))


def dsir_log_ratios(
    grams: DataFrame,
    target_ids: DataFrame,
    id_col: str,
    buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit the two hashed-ngram models and return (bucket, log_ratio)
    with log_ratio = ln p_target(bucket) - ln p_raw(bucket), Laplace-
    smoothed with ``alpha``.  ``grams`` is hashed_gram_buckets output
    over the RAW corpus; ``target_ids`` the target-domain id set
    (dimension-sized or not — it is reduced before any join).  Only
    buckets that occur in the raw corpus appear (absent buckets can
    never be scored).  Result is <= ``buckets`` rows: collect-safe,
    broadcast-safe."""
    tagged = grams.join(
        F.broadcast(target_ids.select(id_col).distinct().withColumn("_t", F.lit(1))),
        id_col,
        "left",
    )
    per_bucket = tagged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_raw"),
        F.sum(F.coalesce(F.col("_t"), F.lit(0))).alias("_tgt"),
    )
    totals = per_bucket.agg(
        F.sum("_raw").alias("_nraw"), F.sum("_tgt").alias("_ntgt")
    )
    b = float(buckets)
    return per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("_tgt") + alpha) / (F.col("_ntgt") + alpha * b))
            - F.log((F.col("_raw") + alpha) / (F.col("_nraw") + alpha * b))
        ).alias("log_ratio"),
    )


def dsir_scores(
    grams: DataFrame, ratios: DataFrame, id_col: str
) -> DataFrame:
    """(id, dsir_logw): per-document importance log-weight — the sum of
    its gram instances' bucket log-ratios.  Broadcast join (ratios is
    <= buckets rows) + combinable per-doc agg."""
    return (
        grams.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum("log_ratio").alias("dsir_logw"))
    )


def gumbel_topk(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    k: int,
    temperature: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel top-k sample of ``k`` rows without replacement,
    proportional to softmax(score/temperature): key = score/T + G with
    G = -ln(-ln(u)) standard Gumbel noise.  u derives from
    md5(seed || id) — deterministic, order-independent, engine-
    portable (no RNG state to reseed per partition).  Output adds
    ``gumbel_key`` and the 1-based ``sel_rank``.

    orderBy+limit plans as TakeOrderedAndProject (per-partition heap
    top-k; only k rows cross the exchange); the rank window then runs
    over the k survivors — k is the OUTPUT size, so the single
    window partition is the result itself, not the corpus."""
    from pyspark.sql import Window

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    key = F.col(score_col) / F.lit(float(temperature)) - F.log(-F.log(u))
    top = (
        scored.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("gumbel_key"), F.col(id_col))
    return top.withColumn("sel_rank", F.row_number().over(w))
