"""End-to-end training-data pipeline composition over the driver
testdata: language-ID -> quality filter -> exact dedup -> MinHash+LSH
near-dup candidates -> Jaccard verify -> single-linkage dedup groups ->
canonical-document selection -> token accounting.

Each stage is an operator the gate already value-checks in isolation;
this test pins that they COMPOSE — ids survive the joins, the kept set
is fingerprint-unique, near-dup groups collapse to one canonical doc,
and the final token count is consistent with the kept set. This is the
shape a 100 TB pre-training corpus pass takes: every join below is a
hash/bucket join and every aggregate is map-side combinable, so the
composition inherits the per-operator scale story.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.operators.clustering import single_linkage
from bigsdb_spark.operators.dedup import (
    exact_duplicate_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard,
    normalized_text,
    word_shingles,
)
from bigsdb_spark.operators.textstats import lang_heuristic, quality_score
from bigsdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # plant exact and near duplicates so the dedup tiers have real work
    exact_dups = docs.filter(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    near_dups = docs.filter(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended tail words")).alias("text"),
    )
    return docs.unionByName(exact_dups).unionByName(near_dups).cache()


@pytest.mark.slow
def test_training_corpus_pipeline_composes(spark, corpus):
    n_input = corpus.count()

    # 1) language gate + quality gate (pure expressions, one scan each)
    lang = lang_heuristic(corpus, "doc_id", "text", threshold=0.02)
    keep_lang = lang.filter(F.col("pred_lang") == "en").select("doc_id")
    quality = quality_score(corpus, "doc_id", "text")
    keep_q = quality.filter(
        (F.col("n_tokens") >= 5) & (F.col("unique_ratio") > 0.2)
    ).select("doc_id")
    gated = corpus.join(keep_lang, on="doc_id").join(keep_q, on="doc_id")
    n_gated = gated.count()
    assert 0 < n_gated <= n_input

    # 2) exact dedup: drop every doc that is a non-keeper duplicate
    ex_pairs = exact_duplicate_pairs(gated, "doc_id", "text")
    dropped_exact = ex_pairs.select(F.col("id2").alias("doc_id")).distinct()
    uniq = gated.join(dropped_exact, on="doc_id", how="left_anti")
    # planted exact dups that survived the gates must all be dropped
    n_planted_exact_kept = uniq.filter(
        (F.col("doc_id") >= 500000) & (F.col("doc_id") < 900000)
    ).count()
    assert n_planted_exact_kept == 0
    # kept set is fingerprint-unique
    fp_dupes = (
        uniq.select(F.md5(normalized_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert fp_dupes == 0

    # 3) near-dup: shingle -> minhash -> LSH candidates -> Jaccard verify
    sh = word_shingles(uniq, "doc_id", "text", k=3)
    cands = lsh_candidate_pairs(minhash_signatures(sh))
    verified = ngram_jaccard(sh, pairs=cands).filter(F.col("jaccard") >= 0.5)
    # the planted near-dups are prefix-copies: they must surface
    planted_hits = verified.filter(
        (F.col("doc2") >= 900000) & (F.col("doc1") == F.col("doc2") - 900000)
    ).count()
    assert planted_hits > 0

    # 4) single-linkage groups over verified pairs; keep smallest id
    nodes = uniq.select(F.col("doc_id").alias("id"))
    groups = single_linkage(
        verified.select(
            F.col("doc1").alias("id1"), F.col("doc2").alias("id2")
        ),
        nodes,
    )
    canonical = groups.filter(F.col("id") == F.col("group_id")).select(
        F.col("id").alias("doc_id")
    )
    final = uniq.join(canonical, on="doc_id")
    n_final = final.count()
    # every group contributes exactly one doc
    assert n_final == groups.select("group_id").distinct().count()
    # no verified near-dup pair survives intact in the final set
    surviving_pairs = (
        verified.join(
            final.select(F.col("doc_id").alias("doc1")), on="doc1"
        )
        .join(final.select(F.col("doc_id").alias("doc2")), on="doc2")
        .count()
    )
    assert surviving_pairs == 0

    # 5) token accounting over the kept corpus
    total_tokens = (
        quality_score(final, "doc_id", "text")
        .agg(F.sum("n_tokens"))
        .collect()[0][0]
    )
    assert total_tokens > 0
    assert n_final <= n_gated


@pytest.mark.slow
def test_corpus_assembly_tail_composes(spark, corpus, tmp_path):
    """The assembly tail downstream of cleaning: LM quality filter ->
    token accounting -> packing into fixed-length examples ->
    deterministic shards on disk -> next-batch incremental dedup
    against the emitted corpus' index. Pins that the round-3 operators
    compose with the cleaning stages above on driver testdata."""
    from bigsdb_spark.operators.lm import perplexity, train_char_lm
    from bigsdb_spark.operators.textstats import token_stats
    from bigsdb_spark.operators.training import (
        build_corpus_index,
        dedup_against_index,
        pack_documents,
        write_training_shards,
    )

    # LM filter: train on the corpus itself, keep the low-perplexity
    # 80% (self-trained filters are the CCNet bootstrap shape)
    model = train_char_lm(corpus)
    ppl = perplexity(corpus, model)
    cutoff = ppl.approxQuantile("perplexity", [0.8], 0.01)[0]
    kept = corpus.join(
        ppl.filter(F.col("perplexity") <= cutoff).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)  # several eager consumers below
    # (index build + shard write + reingest) would otherwise re-run
    # the LM lineage once each
    n_kept = kept.count()
    assert 0 < n_kept < corpus.count()

    # pack token counts into 512-token examples
    toks = token_stats(kept, "doc_id", "text").select("doc_id", "n_tokens")
    packed = pack_documents(toks, "doc_id", "n_tokens", max_len=512, partitions=8)
    stats = packed.groupBy("example_id").agg(F.sum("n_tokens").alias("tot"))
    assert stats.filter(F.col("tot") > 512).count() == 0
    total_in = toks.agg(F.sum("n_tokens")).collect()[0][0]
    total_packed = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_in == total_packed

    # write shards; read back and check coverage
    path = str(tmp_path / "corpus_shards")
    write_training_shards(kept, path, "doc_id", n_shards=8, seed=7)
    back = spark.read.parquet(path)
    assert back.count() == n_kept

    # a re-ingest of the SAME corpus dedups to nothing against its index
    index = build_corpus_index(kept, "doc_id", "text")
    reingest = kept.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    out = dedup_against_index(reingest, index, "doc_id", "text")
    assert out["kept"].count() == 0
