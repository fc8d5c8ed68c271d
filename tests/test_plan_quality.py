"""Physical-plan regression guards: the scale properties the engine
promises must be visible in the plans Catalyst actually produces —
pushdown reaching the scan, pruned read schemas, broadcast dimension
joins, and equi- (not nested-loop) joins on the split wildcard path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.inventory import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(QUERIES["s1_view_scan"](spark, SF))
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan


def test_column_pruning(spark):
    plan = plan_of(QUERIES["s1_view_scan"](spark, SF))
    assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>" in plan


def test_dimension_joins_broadcast(spark):
    plan = plan_of(QUERIES["j8_multihop_rollup"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region
    assert "CartesianProduct" not in plan


def test_lsh_join_is_hash_join(spark):
    from bigsdb_spark.inventory.llm import dedup_minhash

    plan = plan_of(dedup_minhash(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wildcard_scheme_join_is_equi(spark):
    """The A5 wildcard path must plan the big (exact) side as an
    equi-join on (pos, allele) — an OR condition would degrade to a
    nested-loop/position-only join."""
    from bigsdb_spark.operators.profiles import assign_scheme_fields, build_profiles

    long_df = spark.createDataFrame(
        [(1, "a", "1"), (1, "b", "2")], "iso int, locus string, allele string"
    )
    prof = build_profiles(long_df, "iso", "locus", "allele")
    scheme = spark.createDataFrame(
        [("9", ["N", "2"])], "st string, profile array<string>"
    ).withColumn("profile_md5", F.md5(F.array_join("profile", ",")))
    out = assign_scheme_fields(
        prof, scheme, allow_missing_loci=True, total_loci=2,
        prune_candidates=False,  # pin the UNPRUNED inverted-index plan
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    # and the r11 default (pruned, auto knob) plans clean too
    dflt = assign_scheme_fields(
        prof, scheme, allow_missing_loci=True, total_loci=2
    )
    assert "CartesianProduct" not in plan_of(dflt)


def test_interval_join_no_cartesian(spark):
    plan = plan_of(QUERIES["j10_interval_containment"](spark, SF))
    assert "CartesianProduct" not in plan


def test_partitioned_write_prunes(spark, tmp_path):
    """X4 analogue: a designation store partitioned by locus must let a
    locus-filtered scan prune partitions (PartitionFilters in the scan,
    not a full read)."""
    from bigsdb_spark.sources.sinks import write_partitioned

    df = spark.createDataFrame(
        [(i, f"L{i % 5}", str(i)) for i in range(100)],
        "isolate_id int, locus string, allele string",
    )
    path = str(tmp_path / "desig")
    write_partitioned(df, path, ["locus"])
    scan = spark.read.parquet(path).filter(F.col("locus") == "L3")
    plan = plan_of(scan)
    assert "PartitionFilters: [isnotnull(locus" in plan
    assert scan.count() == 20


def test_kmer_prefilter_is_hash_join(spark):
    """F10: the k-mer candidate join must be an equi/hash join on the
    kmer key — never a nested-loop sequence comparison."""
    plan = plan_of(QUERIES["f10_partial_match"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_suite_single_corpus_scan_for_scalars(spark):
    """The text suite computes all scalar columns in one projection:
    exactly two scans of documents total (scalar pass + the SimHash
    explode/groupBy pass), not one scan per column family."""
    plan = plan_of(QUERIES["t_text_suite"](spark, SF))
    assert plan.count("documents.parquet") <= 2


def test_genome_compare_distance_is_locus_hash_join(spark):
    """GenomeComparator pair distances: self-join on the locus key ->
    hash join, never a nested loop over isolate pairs."""
    from bigsdb_spark.operators.genome_compare import pairwise_distances

    df = spark.createDataFrame(
        [(i, f"L{j}", str((i * j) % 7)) for i in range(20) for j in range(5)],
        "isolate_id int, locus string, allele_id string",
    )
    plan = plan_of(pairwise_distances(df, truncated_pairwise_same=True))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_dup_pairs_use_window_not_self_join(spark):
    """Star-shaped exact-dup pairs come from a window-min over the
    fingerprint partition — the plan must contain a Window, and no join
    at all (a fingerprint self-join would square the hot groups)."""
    from bigsdb_spark.operators.dedup import exact_duplicate_pairs

    df = spark.createDataFrame(
        [(i, f"text {i % 3}") for i in range(30)], "doc_id long, text string"
    )
    plan = plan_of(exact_duplicate_pairs(df, "doc_id", "text"))
    assert "Window" in plan
    assert "Join" not in plan


def test_near_dup_embedding_join_is_bucket_equi(spark):
    from bigsdb_spark.operators.dedup import embedding_near_duplicates
    from bigsdb_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    plan = plan_of(
        embedding_near_duplicates(emb, "vec_id", "embedding", min_cosine=0.9)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    """The bucketed designation store: two tables bucketed on
    isolate_id into the same bucket count must join with ZERO Exchange
    (the shuffle was paid once at write time). This is the co-location
    contract for the 100 TB fact-fact joins."""
    from bigsdb_spark.sources.bucketed import co_located_join, write_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktdb LOCATION '{tmp_path}/wh'")
    # autoBucketedScan drops the bucketed layout when it thinks a plain
    # scan is cheaper (tiny test tables); pin it on for the contract
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        desig = spark.createDataFrame(
            [(i % 50, f"L{i % 7}", str(i)) for i in range(1000)],
            "isolate_id int, locus string, allele_id string",
        )
        iso = spark.createDataFrame(
            [(i, f"iso{i}") for i in range(50)], "isolate_id int, name string"
        )
        write_bucketed(desig, "bktdb.designations", "isolate_id", 8)
        write_bucketed(iso, "bktdb.isolates", "isolate_id", 8)
        # hint("merge") on the input forbids broadcast so the bucketed
        # layout does the work (at real scale neither side broadcasts)
        joined = (
            spark.table("bktdb.designations")
            .hint("merge")
            .join(spark.table("bktdb.isolates"), on="isolate_id")
        )
        assert co_located_join(
            spark, "bktdb.designations", "bktdb.isolates", on="isolate_id"
        ).count() == 1000
        plan = plan_of(joined)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP DATABASE IF EXISTS bktdb CASCADE")


def test_np_topk_no_driver_materialization(spark):
    """The block-matmul top-k is fully distributed: the only broadcast
    is the driver-built O(n_blocks²) pair list, and both block fan-out
    joins are equi-joins — no collect() feeds the plan, the corpus
    never rides in a task closure, and no plan shape ships the corpus
    as a broadcast/nested-loop side."""
    from bigsdb_spark.operators.similarity import cosine_topk_pairs_np
    from bigsdb_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    plan = plan_of(cosine_topk_pairs_np(emb, "vec_id", "embedding", k=5))
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_export_dataset_wide_table_joins_are_equi(spark):
    """Export-plugin wide table: the locus pivot is one groupBy and the
    provenance/scheme attachments are equi left-joins — no nested-loop
    or cartesian anywhere in the wide-table plan."""
    from bigsdb_spark.operators.export_dataset import dataset_export

    iso = spark.createDataFrame(
        [(i, f"c{i % 3}", 2000 + i % 20) for i in range(50)],
        "isolate_id int, country string, year int",
    )
    desig = spark.createDataFrame(
        [(i % 50, f"L{j}", str((i + j) % 9)) for i in range(200) for j in range(3)],
        "isolate_id int, locus string, allele_id string",
    )
    cache = spark.createDataFrame(
        [(i, f"ST-{i % 7}") for i in range(50)], "isolate_id int, ST string"
    )
    out = dataset_export(
        iso, ["country", "year"], designations=desig,
        loci=["L0", "L1", "L2"], scheme_cache=cache, scheme_fields=["ST"],
    )
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_discover_new_alleles_joins_are_equi(spark):
    """F11 discovery: the k-mer seed join, the md5 anti-join and the
    sub/super-sequence containment join all key on (locus, ...) equi
    columns — the containment predicate is a filter AFTER a locus hash
    join, never a nested-loop over the full candidate x allele space."""
    from bigsdb_spark.operators.seqmatch import discover_new_alleles

    contigs = spark.createDataFrame(
        [(1, "GATCGATCGATCGATCGATCAAGG"), (2, "TTGATCGATCGATCGATCGATCAA")],
        "id long, sequence string",
    )
    alleles = spark.createDataFrame(
        [("abcZ", "1", "GATCGATCGATCGATCGATC")],
        "locus string, allele_id string, sequence string",
    )
    plan = plan_of(discover_new_alleles(contigs, alleles, k=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_streaming_profile_cache_is_single_stateful_operator(spark, tmp_path):
    """The incremental scheme cache must plan as ONE
    applyInPandasWithState stateful operator over a single key shuffle
    — no join against a static profile table per micro-batch."""
    from bigsdb_spark.streaming.events import (
        read_event_stream,
        streaming_profile_cache,
    )

    src = str(tmp_path / "plan_src")
    spark.createDataFrame(
        [(1, "abcZ", "1", "2024-01-01 00:00:00")],
        "isolate_id long, locus string, allele_id string, ts_s string",
    ).select(
        "isolate_id", "locus", "allele_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
    ).write.parquet(src)
    cache = streaming_profile_cache(
        read_event_stream(spark, src), ["abcZ", "adk"]
    )
    logical = cache._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandasWithState" in logical
    assert "Join" not in logical


def test_scan_suite_joins_are_hash_joins(spark):
    """F11/F12/D11 scan suite: window->allele and primer-occurrence
    pairing are equi-joins (the md5-window / primer-window keys), never
    a cartesian sequence comparison; the small allele/primer/mutation
    dims broadcast."""
    plan = plan_of(QUERIES["f11_f12_d11_scan_suite"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_decontamination_join_is_broadcast(spark):
    """The corpus side of the decontamination join must NOT shuffle
    before the match: benchmark grams broadcast, corpus grams stream
    through map-side; only the matched set pays a shuffle."""
    from pyspark.sql import functions as F

    from bigsdb_spark.operators.corpus import benchmark_ngram_hits
    from bigsdb_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 40 == 0)
    plan = plan_of(benchmark_ngram_hits(docs, bench, "doc_id", "text", n=5))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_joins_are_hash(spark):
    """dedup_against_index: all three tiers anti/semi-join on hash keys —
    the LIKE/prefix shapes elsewhere must not leak in here."""
    from bigsdb_spark.operators.training import build_corpus_index, dedup_against_index

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "iota kappa lambda mu nu xi omicron pi")], "doc_id long, text string"
    )
    idx = build_corpus_index(corpus, "doc_id", "text")
    plan = plan_of(dedup_against_index(new, idx, "doc_id", "text")["kept"])
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shard_assignment_no_shuffle(spark):
    """shard_assignments is a pure projection: no Exchange until the
    writer repartitions on the shard key."""
    from bigsdb_spark.operators.training import shard_assignments

    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = plan_of(shard_assignments(df, "doc_id", 8))
    assert "Exchange" not in plan


def test_annotation_candidates_broadcasts_metadata(spark):
    """The per-tool analysis_results/last_run slices broadcast against
    the big seqbin_stats side (update_kleborate.pl's left joins)."""
    import datetime as dt

    from bigsdb_spark.operators.analysis import annotation_candidates

    ss = spark.createDataFrame([(1, 2_000_000)], "isolate_id long, total_length long")
    ar = spark.createDataFrame([], "isolate_id long, name string, datestamp date")
    lr = spark.createDataFrame([], "isolate_id long, name string, timestamp date")
    plan = plan_of(
        annotation_candidates(ss, ar, lr, "Kleborate", 1, dt.date(2026, 8, 14))
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_normalize_analysis_cache_single_scan_per_name(spark):
    """The JSONPath normalizer evaluates all of one analysis' paths as
    expressions over a single filter+generate — no joins at all."""
    from bigsdb_spark.operators.analysis import normalize_analysis_json

    results = spark.createDataFrame(
        [(1, "T", '{"fields":[{"a":"x"}]}')],
        "isolate_id long, name string, results string",
    )
    fields = spark.createDataFrame(
        [("T", "$.fields[*].a"), ("T", "$.fields[*].b")],
        "analysis_name string, json_path string",
    )
    plan = plan_of(normalize_analysis_json(results, fields))
    assert "Join" not in plan
    assert plan.count("Generate") >= 1


def test_pq_topk_is_pure_scan(spark):
    """ADC top-k must be a joinless scan of the codes table — the
    lookup tables are literals, never a join side."""
    from bigsdb_spark.operators.pq import pq_topk

    codes = spark.createDataFrame(
        [(1, [0, 1]), (2, [1, 0])], "vec_id long, codes array<int>"
    )
    books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]
    plan = plan_of(pq_topk(codes, books, [0.5, 0.5, 0.5, 0.5], top_k=1))
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort


def test_perplexity_model_join_broadcasts(spark):
    from bigsdb_spark.operators.lm import perplexity, train_char_lm

    corpus = spark.createDataFrame([("abcabcabc",)], "text string")
    model = train_char_lm(corpus)
    docs = spark.createDataFrame([(1, "abcabc")], "doc_id long, text string")
    plan = plan_of(perplexity(docs, model))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_documents_single_exchange(spark):
    """Packing costs exactly one shuffle (the route repartition); the
    Arrow packer runs partition-local on top of it."""
    from bigsdb_spark.operators.training import pack_documents

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 * 100).alias("n_tokens")
    )
    plan = plan_of(pack_documents(df, "doc_id", "n_tokens", 2048, partitions=4))
    assert plan.count("Exchange") == 1


@pytest.mark.slow
def test_ivf_pq_probed_scan_prunes_partitions(spark, tmp_path):
    """VERDICT r3 #2: ivf_pq_topk claims a 1/n_cells read when the
    codes table is written partitioned by cell — prove it.  Write the
    encoded table partitionBy('cell'); the probe filter must appear as
    PartitionFilters on the scan (a pruned directory read), and the
    scoring must stay joinless."""
    import numpy as np

    from bigsdb_spark.operators.pq import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    rng = np.random.RandomState(3)
    pts = rng.randn(64, 8).round(3)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in pts[i]]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    model = train_ivf_pq(emb, n_cells=4, m=2, k=8, sample=64)
    path = str(tmp_path / "codes")
    ivf_pq_encode(emb, model).write.partitionBy("cell").parquet(path)
    encoded = spark.read.parquet(path)
    top = ivf_pq_topk(
        encoded, model, [float(v) for v in pts[5]], top_k=3, n_probe=2
    )
    plan = plan_of(top)
    assert "PartitionFilters: [cell" in plan or (
        "PartitionFilters: [" in plan and "cell#" in plan.split(
            "PartitionFilters: ["
        )[1].split("]")[0]
    )
    assert "Join" not in plan
    # and the probed read really returns the right neighbor
    assert top.collect()[0]["vec_id"] == 5


def test_salted_lsh_band_join_spreads_hot_bucket(spark):
    """VERDICT r3 #8: a band bucket holding a pathological share of the
    corpus (boilerplate dups) puts its quadratic expansion in one task;
    the salted variant adds salt equality to the join keys so the hot
    bucket spreads over R tasks.  Equality: the salted pair set IS the
    unsalted pair set; plan: still an equi-join (salt among the keys),
    never a nested loop."""
    from bigsdb_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_salted,
        minhash_signatures,
        word_shingles,
    )

    boiler = "this page is intentionally left blank for legal reasons ok"
    rows = [(i, boiler + f" {i % 3}") for i in range(40)]  # hot buckets
    rows += [
        (100 + i, f"unique document number {i} about spark and parquet files")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(word_shingles(df, "doc_id", "text"), 8)
    plain = {
        (r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(sigs).collect()
    }
    # hot_threshold=8: the ~13-doc boiler buckets cross it (really
    # salted), the unique docs stay on the plain cold branch — the
    # equality check crosses the hot/cold boundary
    salted_df = lsh_candidate_pairs_salted(
        sigs, salt_buckets=4, hot_threshold=8
    )
    salted = {(r["doc1"], r["doc2"]) for r in salted_df.collect()}
    assert salted == plain and len(plain) > 100  # hot bucket is real
    plan = plan_of(salted_df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "salt" in plan and "rep" in plan  # salt keys reached the join
    # selective form: everything-hot (threshold 0) still equals plain
    all_salted = lsh_candidate_pairs_salted(
        sigs, salt_buckets=4, hot_threshold=0
    )
    assert {(r["doc1"], r["doc2"]) for r in all_salted.collect()} == plain


def test_dsir_pipeline_plan_shape(spark):
    """DSIR: the fit's target join and the score's ratio join must both
    broadcast (dimension side <= buckets rows); Gumbel top-k selection
    must plan as TakeOrderedAndProject (per-partition heap top-k), not
    a global Sort."""
    from bigsdb_spark.operators.corpus import (
        dsir_log_ratios,
        dsir_scores,
        gumbel_topk,
        hashed_gram_buckets,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(20)],
        "doc_id long, text string",
    )
    grams = hashed_gram_buckets(docs, "doc_id", "text", buckets=64)
    ratios = dsir_log_ratios(
        grams, docs.filter("doc_id < 4").select("doc_id"), "doc_id", buckets=64
    )
    assert "BroadcastHashJoin" in plan_of(ratios)
    scored = dsir_scores(grams, ratios, "doc_id")
    score_plan = plan_of(scored)
    assert "BroadcastHashJoin" in score_plan
    assert "SortMergeJoin" not in score_plan
    sel_plan = plan_of(gumbel_topk(scored, "doc_id", "dsir_logw", k=5))
    assert "TakeOrderedAndProject" in sel_plan


def test_a5_verify_join_builds_on_narrow_side(spark):
    """r11 (VERDICT r10 #6): the pruned wildcard verify must hash-BUILD
    on the narrow side of each join — candidates (two longs/row) for
    the isolate join, the definition table for the def join.  r10
    hinted the array-carrying sides, so each task's build map held
    ~N*L*20B/partitions and the cg_4e6 tier OOM'd a 24 GB heap inside
    HashedRelation.grow; with the narrow build, cg_1e6 fits 12 GB
    (BASELINE.md r11 memory ladder)."""
    import re

    from bigsdb_spark.operators.profiles import assign_scheme_fields

    iso = spark.createDataFrame(
        [(i, ["1", "2", "3"]) for i in range(10)],
        "profile_key int, profile array<string>",
    ).withColumn("profile_md5", F.md5(F.array_join("profile", ",")))
    sch = spark.createDataFrame(
        [("a", ["1", "N", "3"])], "st string, profile array<string>"
    )
    out = assign_scheme_fields(
        iso, sch, allow_missing_loci=True, total_loci=3, prune_positions=1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    key_join = re.search(
        r"ShuffledHashJoin \[profile_key#\d+\], \[profile_key#\d+\], "
        r"Inner, (Build\w+)",
        plan,
    )
    st_join = re.search(
        r"ShuffledHashJoin \[st#\d+\], \[st#\d+\], Inner, (Build\w+)", plan
    )
    assert key_join and key_join.group(1) == "BuildLeft"  # cand side
    assert st_join and st_join.group(1) == "BuildRight"  # defs side
