"""Inventory: training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) over the documents /
embeddings tables — the beyond-reference extension family (SURVEY §7 M8).

The md5-based minhash/LSH keeps every step oracle-checkable in DuckDB;
the normalized-text expression is character-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigsdb_spark.inventory.registry import register, tbl
from bigsdb_spark.operators.dedup import (
    exact_duplicates,
    fingerprint,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    word_shingles,
)
from bigsdb_spark.operators.similarity import (
    bucketed_ann_pairs,
    cosine_topk_pairs,
    nearest_neighbor,
)
from bigsdb_spark.operators.textstats import lang_heuristic, quality_score, token_stats

# normalized text, shingles and tokens — DuckDB spellings of the exact
# expressions in operators/dedup.py::normalized_text / word_shingles
_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_TOKS_CTE = f"toks AS (SELECT doc_id AS doc, string_split({_NORM}, ' ') AS t FROM documents)"
_SHINGLES_CTE = f"""
    {_TOKS_CTE},
    sh AS (
        SELECT DISTINCT doc,
               t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS shingle
        FROM toks, UNNEST(range(1, greatest(len(t) - 2, 0) + 1)) AS u(i))
"""


@register(
    "t_fingerprint",
    oracle=f"SELECT doc_id, md5({_NORM}) AS fp FROM documents",
)
def t_fingerprint(spark, sf_dir):
    """Document fingerprint: md5 of normalized text."""
    return fingerprint(tbl(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "dedup_exact",
    oracle=f"""
    WITH fp AS (SELECT doc_id, md5({_NORM}) AS fp FROM documents)
    SELECT fp, count(*) AS n_docs, min(doc_id) AS min_id
    FROM fp GROUP BY fp HAVING count(*) > 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the fingerprint; min_id is the
    canonical survivor (generalizes GenomeComparator unique strains)."""
    return exact_duplicates(tbl(spark, sf_dir, "documents"), "doc_id", "text")


_LSH_CTE = f"""
    {_SHINGLES_CTE},
    sig AS (
        SELECT doc,
               min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
               min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
               min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
               min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
        FROM sh GROUP BY doc),
    bands AS (
        SELECT doc, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
        UNION ALL SELECT doc, 1, md5(h2 || '|' || h3) FROM sig
        UNION ALL SELECT doc, 2, md5(h4 || '|' || h5) FROM sig
        UNION ALL SELECT doc, 3, md5(h6 || '|' || h7) FROM sig),
    cand AS (
        SELECT DISTINCT a.doc AS doc1, b.doc AS doc2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc)
"""


@register(
    "dedup_minhash_lsh",
    oracle=f"WITH {_LSH_CTE} SELECT doc1, doc2 FROM cand",
)
def dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup candidates: shingle -> md5-minhash signature
    (8 hashes) -> 4 bands of 2 -> bucket equi-join. The join key is the
    band bucket, so candidate generation is a hash join, never O(n²)."""
    sh = word_shingles(tbl(spark, sf_dir, "documents"), "doc_id", "text", k=3)
    sig = minhash_signatures(sh, n_hashes=8)
    return lsh_candidate_pairs(sig, n_hashes=8, band_size=2)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_LSH_CTE},
    sizes AS (SELECT doc, count(*) AS sz FROM sh GROUP BY doc),
    common AS (
        SELECT c.doc1, c.doc2, count(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc = c.doc1
        JOIN sh b ON b.doc = c.doc2 AND b.shingle = a.shingle
        GROUP BY 1, 2)
    SELECT doc1, doc2, n_common, s1.sz AS n1, s2.sz AS n2,
           round(n_common / (s1.sz + s2.sz - n_common), 6) AS jaccard
    FROM common
    JOIN sizes s1 ON s1.doc = doc1
    JOIN sizes s2 ON s2.doc = doc2
    """,
)
def dedup_jaccard(spark, sf_dir):
    """N-gram Jaccard verification of the LSH candidates — the two-stage
    scale path: LSH prunes the pair space, candidate-driven intersection
    joins verify. Work is linear in candidates, not corpus²."""
    # cache + materialize the shingle set: it feeds the signature
    # pipeline AND both sides of the candidate intersection join
    # (3 consumers in one job would race a cold cache)
    sh = word_shingles(tbl(spark, sf_dir, "documents"), "doc_id", "text", k=3).cache()
    sh.count()
    sig = minhash_signatures(sh, n_hashes=8)
    cand = lsh_candidate_pairs(sig, n_hashes=8, band_size=2)
    return ngram_jaccard(sh, pairs=cand)


@register("dedup_simhash")  # conv(hex) has no DuckDB analogue -> rows-only check
def dedup_simhash(spark, sf_dir):
    """SimHash fingerprints (md5-bit votes). Verified by a pure-python
    reference implementation in tests/test_dedup.py."""
    return simhash(tbl(spark, sf_dir, "documents"), "doc_id", "text", bits=16)


@register(
    "t_token_stats",
    oracle=f"""
    WITH {_TOKS_CTE},
    d AS (SELECT doc_id, text FROM documents)
    SELECT d.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           round(length(regexp_replace(text, '\\s', '', 'g')) / len(t), 4)
               AS mean_token_len,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_tokens
    FROM d JOIN toks ON toks.doc = d.doc_id
    """,
)
def t_tokens(spark, sf_dir):
    """Token counting: whitespace tokens, chars, mean token length,
    vocabulary size."""
    return token_stats(tbl(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "t_quality_score",
    oracle=f"""
    WITH {_TOKS_CTE},
    d AS (SELECT doc_id, text FROM documents),
    feats AS (
        SELECT d.doc_id, len(t) AS n_tokens,
               round(len(list_filter(t, x -> x IN ('the','a','of','to','and',
                   'in','is','for','on','it'))) / len(t), 4) AS stop_ratio,
               round(len(list_distinct(t)) / len(t), 4) AS unique_ratio,
               CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
                   AS len_ok
        FROM d JOIN toks ON toks.doc = d.doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, stop_ratio,
           unique_ratio, len_ok,
           round(stop_ratio * 0.4 + unique_ratio * 0.4
                 + CASE WHEN len_ok = 1 THEN 0.2 ELSE 0.0 END, 4) AS quality
    FROM feats
    """,
)
def t_quality(spark, sf_dir):
    """Quality scoring: stopword ratio, vocabulary ratio, length band,
    composite score — the standard pre-training corpus filters."""
    return quality_score(tbl(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "t_lang_heuristic",
    oracle=f"""
    WITH {_TOKS_CTE},
    feats AS (
        SELECT doc,
               round(len(list_filter(t, x -> x IN ('the','a','of','to','and',
                   'in','is','for','on','it'))) / len(t), 4) AS stop_ratio
        FROM toks)
    SELECT doc AS doc_id, stop_ratio,
           CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'other' END AS pred_lang
    FROM feats
    """,
)
def t_lang(spark, sf_dir):
    """Language-ID heuristic (stopword ratio)."""
    return lang_heuristic(tbl(spark, sf_dir, "documents"), "doc_id", "text")


# ------------------------------------------------------------ similarity

_COS = (
    "round(list_dot_product(e1, e2) / "
    "(sqrt(list_dot_product(e1, e1)) * sqrt(list_dot_product(e2, e2))), 6)"
)


@register(
    "sim_brute_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    s AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2, a.e AS e1, b.e AS e2
        FROM v a JOIN v b ON a.vec_id < b.vec_id)
    SELECT id1, id2, {_COS} AS cosine FROM s
    ORDER BY cosine DESC, id1, id2 LIMIT 20
    """,
)
def sim_topk(spark, sf_dir):
    """Brute-force cosine top-k pairs — the ANN baseline. JVM-side
    zip_with/aggregate fold; ties broken by ids before the LIMIT."""
    return cosine_topk_pairs(tbl(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=20)


@register(
    "sim_nn_argmin",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS e1 FROM embeddings
               WHERE vec_id < 50),
    c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS e2 FROM embeddings
          WHERE vec_id >= 50),
    s AS (SELECT qid, cid, {_COS} AS cosine FROM q CROSS JOIN c)
    SELECT qid, cid AS nn_id, cosine FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY cosine DESC, cid) AS rn FROM s) t
    WHERE rn = 1
    """,
)
def sim_nn(spark, sf_dir):
    """Per-query 1-NN by cosine — argmax window with id tiebreak; the
    same shape as the LIN-code closest-profile search (SURVEY W3)."""
    emb = tbl(spark, sf_dir, "embeddings")
    return nearest_neighbor(
        emb.filter(F.col("vec_id") < 50), emb.filter(F.col("vec_id") >= 50),
        "vec_id", "embedding",
    )


@register(
    "sim_bucketed_ann",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END) * 4
             + (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END) * 2
             + (CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS bucket
        FROM embeddings),
    s AS (
        SELECT a.bucket, a.vec_id AS id1, b.vec_id AS id2, a.e AS e1, b.e AS e2
        FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT bucket, id1, id2, {_COS} AS cosine FROM s
    WHERE {_COS} >= 0.2
    """,
)
def sim_bucketed(spark, sf_dir):
    """IVF/LSH-bucketed ANN scale path: sign-bucket partition key turns
    the pair search into a hash join on the bucket id."""
    return bucketed_ann_pairs(
        tbl(spark, sf_dir, "embeddings"), "vec_id", "embedding", dims=3, min_cosine=0.2
    )


# ------------------------------------------------------------ multimodal

@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def mm_binary(spark, sf_dir):
    """Multimodal plumbing: opaque binary payload column + JVM-side
    metadata (byte length, content hash) — exact media dedup needs no
    decode at all."""
    from bigsdb_spark.operators.multimodal import binary_metadata

    docs = tbl(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )
    return binary_metadata(payloads, "doc_id", "payload")


@register("sim_brute_topk_np")  # numpy BLAS path; equality vs the
# expression version is asserted in tests — rows-only here
def sim_topk_np(spark, sf_dir):
    """Vectorized brute-force top-k (Arrow + numpy block matmul) — the
    fast path for the same computation as sim_brute_topk."""
    from bigsdb_spark.operators.similarity import cosine_topk_pairs_np

    return cosine_topk_pairs_np(
        tbl(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=20
    )


@register("sim_ivf_kmeans")  # MLlib k-means seeds aren't reproducible in SQL
def sim_ivf(spark, sf_dir):
    """True IVF ANN: k-means|| coarse quantizer partitions the corpus,
    search runs per-cell (equi-join on centroid id). Recall measured
    against the brute-force baseline in tests/test_dedup_similarity.py."""
    from bigsdb_spark.operators.similarity import ivf_kmeans_ann

    return ivf_kmeans_ann(
        tbl(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        n_centroids=8, top_k=5,
    )


@register("mm_feature_extract")  # stubbed decode -> rows-only check
def mm_features(spark, sf_dir):
    """Multimodal decode/feature-extract via Arrow-batched mapInPandas.
    The codec is a deterministic stub (libraries not in this container);
    the schema / batching / UDF plumbing is the real scale pattern — see
    bigsdb_spark/operators/multimodal.py."""
    from bigsdb_spark.operators.multimodal import extract_features

    docs = tbl(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return extract_features(payloads, "doc_id", "payload")
