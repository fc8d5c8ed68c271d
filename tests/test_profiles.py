"""Scheme warehouse semantics on FIXTURES.md-style domain data:
profile pivot, md5 identity, the A5 exact + wildcard assignment paths,
completeness, and the D1-D3 distance family with 'N' sentinels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.operators.profiles import (
    assign_scheme_fields,
    build_profiles,
    hamming_zipwith,
    matching_profiles,
    profile_pair_distances,
    scheme_completeness,
)

LOCI = ["abcZ", "adk", "aroE", "fumC", "gdh", "pdhC", "pgm"]


@pytest.fixture(scope="module")
def designations(spark):
    def rows_for(iso, alleles):
        return [(iso, loc, a) for loc, a in zip(LOCI, alleles)]

    rows = (
        rows_for(1, ["1", "3", "4", "1", "1", "1", "14"])    # == ST-1
        + rows_for(2, ["1", "3", "4", "1", "1", "1", "14"])  # == ST-1 (dup)
        + rows_for(3, ["1", "3", "4", "1", "1", "1", "15"])  # SLV of 1
        + rows_for(4, ["2", "3", "4", "1", "1", "1", "14"])  # matches ST-9 only via N
        + [(5, "abcZ", "1"), (5, "adk", "3")]                # incomplete
        + rows_for(6, ["1", "3", "4", "1", "1", "1", "14"])
        + [(6, "pgm", "15")]                                 # paralog: 2nd pgm designation
    )
    return spark.createDataFrame(rows, "isolate_id int, locus string, allele_id string")


@pytest.fixture(scope="module")
def scheme(spark):
    # mv_scheme rows: st + ordered allele vector (locus-name order)
    defs = [
        ("1", ["1", "3", "4", "1", "1", "1", "14"]),
        ("2", ["1", "3", "4", "1", "1", "1", "15"]),
        ("9", ["N", "3", "4", "1", "1", "1", "14"]),  # wildcard at abcZ
    ]
    return spark.createDataFrame(defs, "st string, profile array<string>").withColumn(
        "profile_md5", F.md5(F.array_join("profile", ","))
    )


def test_pivot_orders_by_locus(spark, designations):
    prof = build_profiles(
        designations.filter(F.col("isolate_id") == 1), "isolate_id", "locus", "allele_id"
    ).collect()[0]
    # locus alphabetical order: abcZ, adk, aroE, fumC, gdh, pdhC, pgm
    assert prof.profile == ["1", "3", "4", "1", "1", "1", "14"]


def test_exact_md5_assignment(spark, designations, scheme):
    """A5 path (a): complete & unique -> md5 equi-join
    (sql/isolatedb.sql:1529-1540)."""
    complete = designations.filter(F.col("isolate_id").isin(1, 2, 3))
    prof = build_profiles(complete, "isolate_id", "locus", "allele_id")
    got = {
        r.profile_key: r.st
        for r in assign_scheme_fields(prof, scheme, allow_missing_loci=False).collect()
    }
    assert got == {1: "1", 2: "1", 3: "2"}


def test_wildcard_assignment(spark, designations, scheme):
    """A5 path (c): definition-side 'N' matches any isolate allele
    (sql/isolatedb.sql:1555-1566)."""
    iso4 = designations.filter(F.col("isolate_id") == 4)
    prof = build_profiles(iso4, "isolate_id", "locus", "allele_id")
    got = assign_scheme_fields(
        prof, scheme, allow_missing_loci=True, total_loci=7
    ).collect()
    assert {(r.profile_key, r.st) for r in got} == {(4, "9")}


def test_completeness_distinct_counting(spark, designations):
    """A6: paralogous double designations count once
    (CombinationQueryPage.pm:448-452 forces DISTINCT)."""
    loci_df = spark.createDataFrame([(x,) for x in LOCI], "locus string")
    got = {
        r.isolate_id: (r.n_loci, r.completeness)
        for r in scheme_completeness(
            designations, loci_df, "isolate_id", "locus", 7
        ).collect()
    }
    assert got[5] == (2, round(2 / 7, 4))
    assert got[6] == (7, 1.0)  # 8 designations but 7 distinct loci


def test_pair_distances_and_matching(spark, designations):
    pd = profile_pair_distances(
        designations.filter(F.col("isolate_id").isin(1, 3)),
        "isolate_id",
        "locus",
        "allele_id",
    ).collect()
    assert len(pd) == 1 and pd[0].hamming == 1 and pd[0].shared == 7
    pairs = profile_pair_distances(
        designations.filter(F.col("isolate_id").isin(1, 3, 4)),
        "isolate_id",
        "locus",
        "allele_id",
    )
    slv = matching_profiles(pairs, total_loci=7, k=1)
    got = {(r.id1, r.id2) for r in slv.collect()}
    assert got == {(1, 3), (1, 4), (3, 4)} - {(3, 4)}  # 3 vs 4 differ at 2 loci


def test_hamming_zipwith_ignores_N(spark):
    df = spark.createDataFrame(
        [(["1", "N", "3"], ["1", "2", "4"])], "a array<string>, b array<string>"
    )
    got = df.select(hamming_zipwith(F.col("a"), F.col("b")).alias("d")).collect()[0].d
    assert got == 1  # position 2 ignored ('N'), position 3 differs


def test_define_new_profiles(spark):
    """define_profiles.pl semantics: skip too-missing profiles, skip
    existing matches, one new sequential ST per distinct new profile
    (first-isolate order), identical isolates share the new ST."""
    from bigsdb_spark.operators.profiles import build_profiles, define_new_profiles

    iso_long = [
        # isolate 1 & 3: identical new profile -> one ST, shared
        (1, "a", "5"), (1, "b", "7"),
        (3, "a", "5"), (3, "b", "7"),
        # isolate 2: matches existing ST 4 -> no new profile
        (2, "a", "1"), (2, "b", "2"),
        # isolate 4: new but 1 missing locus -> excluded at max_missing=0
        (4, "a", "N"), (4, "b", "9"),
        # isolate 5: another new profile, later id -> second new ST
        (5, "a", "8"), (5, "b", "8"),
    ]
    iso = build_profiles(
        spark.createDataFrame(iso_long, "id int, locus string, allele string"),
        "id", "locus", "allele",
    )
    scheme_long = [("4", "a", "1"), ("4", "b", "2"), ("9", "a", "3"), ("9", "b", "3")]
    scheme = build_profiles(
        spark.createDataFrame(scheme_long, "st string, locus string, allele string"),
        "st", "locus", "allele",
    )
    got = {r["st"]: r for r in define_new_profiles(iso, scheme).collect()}
    # existing max ST = 9 -> new STs 10, 11 in first-isolate order
    assert set(got) == {"10", "11"}
    assert got["10"]["isolate_keys"] == [1, 3] and got["10"]["n_isolates"] == 2
    assert list(got["10"]["profile"]) == ["5", "7"]
    assert got["11"]["isolate_keys"] == [5]

    relaxed = define_new_profiles(iso, scheme, max_missing=1).collect()
    assert len(relaxed) == 3  # isolate 4's profile now eligible


def test_define_new_profiles_rejects_short_profiles(spark):
    """An isolate with an UNDESIGNATED locus builds a short vector that
    max_missing cannot see (it only counts explicit 'N'/'0'); with
    total_loci the guard keeps the corrupt short profile out of the
    warehouse (define_profiles.pl's get_profile always emits
    full-length vectors)."""
    from bigsdb_spark.operators.profiles import build_profiles, define_new_profiles

    iso = build_profiles(
        spark.createDataFrame(
            [(1, "a", "5"), (1, "b", "7")],  # locus 'c' undesignated
            "id int, locus string, allele string",
        ),
        "id", "locus", "allele",
    )
    scheme = build_profiles(
        spark.createDataFrame(
            [("4", "a", "1"), ("4", "b", "2"), ("4", "c", "3")],
            "st string, locus string, allele string",
        ),
        "st", "locus", "allele",
    )
    # without the guard the 2-allele vector would become a new ST
    assert define_new_profiles(iso, scheme, total_loci=3).count() == 0


def test_wildcard_assignment_excludes_misaligned_vectors(spark, designations, scheme):
    """Positional wildcard matching requires dense vectors: isolate 6's
    paralogous extra designation (8 entries for a 7-locus scheme) shifts
    positions and must be excluded, not spuriously matched; isolate 5's
    short vector likewise."""
    prof = build_profiles(
        designations.filter(F.col("isolate_id").isin(5, 6)),
        "isolate_id", "locus", "allele_id",
    )
    got = assign_scheme_fields(
        prof, scheme, allow_missing_loci=True, total_loci=7
    ).collect()
    assert got == []


def test_pairs_memo_keys_on_session_object_not_id(monkeypatch):
    """Regression (ADVICE r2): the d1-d7 pair-frame memo keyed on
    id(spark); CPython reuses ids after GC, so a new session could be
    served a cached frame bound to a dead session. The memo is now a
    WeakKeyDictionary on the session object: distinct sessions never
    collide, and entries vanish with the session."""
    import gc

    from bigsdb_spark.inventory import typing as ity

    calls = []

    class FakeFrame:
        def cache(self):
            return self

    class FakeSession:
        pass

    def fake_pairs(subset, *a, **kw):
        calls.append(id(subset))  # don't hold the session alive
        return FakeFrame()

    monkeypatch.setattr(ity, "profile_pair_distances", fake_pairs)
    monkeypatch.setattr(ity, "_subset", lambda spark, sf_dir: spark)
    ity._pairs_memo.clear()

    s1, s2 = FakeSession(), FakeSession()
    f1 = ity._pairs(s1, "/sf")
    assert ity._pairs(s1, "/sf") is f1  # memo hit, same session
    f2 = ity._pairs(s2, "/sf")
    assert f2 is not f1  # no cross-session collision
    assert len(calls) == 2
    del s1
    gc.collect()
    assert len(ity._pairs_memo) == 1  # dead session's entry evicted


@pytest.mark.slow
def test_wildcard_assignment_pruned_equals_unpruned(spark, designations, scheme):
    """r10 (VERDICT r9 task 1): the rarest-position candidate-pruned
    wildcard path (prune_candidates=True — the Spark-first form of the
    reference's first-k-position indexes, Datastore.pm:2160-2165) must
    return exactly the unpruned inverted-index join's rows on (a) the
    domain fixture and (b) a randomized skew corpus with multi-match,
    zero-match, unmatched-allele (free-rejection) and 'N'-heavy
    definitions."""
    import random as _random

    # (a) fixture: all isolates incl. incomplete + paralog exclusions
    # (prune_candidates=False pins the UNPRUNED inverted-index join as
    # the comparison base — since r11 the pruned path is the default)
    prof = build_profiles(designations, "isolate_id", "locus", "allele_id")
    base = assign_scheme_fields(
        prof, scheme, allow_missing_loci=True, total_loci=7,
        prune_candidates=False,
    ).collect()
    for k_sel in (1, 3):
        pruned = assign_scheme_fields(
            prof, scheme, allow_missing_loci=True, total_loci=7,
            prune_candidates=True, prune_positions=k_sel,
        ).collect()
        assert {tuple(r) for r in pruned} == {tuple(r) for r in base}
    # the r11 DEFAULT (pruned, auto knob) must also match
    dflt = assign_scheme_fields(
        prof, scheme, allow_missing_loci=True, total_loci=7
    ).collect()
    assert {tuple(r) for r in dflt} == {tuple(r) for r in base}
    assert len(base) > 0

    # (b) randomized skew corpus: Zipf-ish allele popularity, multiple
    # 'N' positions per definition, isolates cloned from definitions
    # (guaranteed matches), mutated clones, and pure-noise isolates
    # whose alleles appear in no definition (exercise the cost-0 exit)
    rng = _random.Random(99)
    total = 6
    vocab = [str(v) for v in range(1, 13)]
    weights = [1.0 / (i + 1) for i in range(len(vocab))]

    def draw():
        return rng.choices(vocab, weights=weights)[0]

    defs = []
    for st in range(1, 41):
        vec = [draw() for _ in range(total)]
        for p in rng.sample(range(total), rng.randint(0, 2)):
            vec[p] = "N"
        defs.append((str(st), vec))
    iso_rows = []
    key = 0
    for _ in range(120):
        key += 1
        src = rng.choice(defs)[1]
        vec = [draw() if v == "N" else v for v in src]
        if rng.random() < 0.5:  # mutate one position
            p = rng.randrange(total)
            vec[p] = draw()
        iso_rows.append((key, vec))
    for _ in range(15):  # noise isolates with out-of-vocab alleles
        key += 1
        iso_rows.append((key, [str(rng.randint(100, 120)) for _ in range(total)]))
    iso_df = spark.createDataFrame(
        iso_rows, "profile_key int, profile array<string>"
    ).withColumn("profile_md5", F.md5(F.array_join("profile", ",")))
    sch_df = spark.createDataFrame(
        defs, "st string, profile array<string>"
    ).withColumn("profile_md5", F.md5(F.array_join("profile", ",")))
    base2 = assign_scheme_fields(
        iso_df, sch_df, allow_missing_loci=True, total_loci=total,
        prune_candidates=False,
    ).collect()
    for k_sel in (1, 3):
        pruned2 = assign_scheme_fields(
            iso_df, sch_df, allow_missing_loci=True, total_loci=total,
            prune_candidates=True, prune_positions=k_sel,
        ).collect()
        assert {tuple(r) for r in pruned2} == {tuple(r) for r in base2}
    dflt2 = assign_scheme_fields(
        iso_df, sch_df, allow_missing_loci=True, total_loci=total
    ).collect()
    assert {tuple(r) for r in dflt2} == {tuple(r) for r in base2}
    assert len(base2) > 0


def test_auto_prune_positions_rule(spark):
    """r11 (VERDICT r10 #2): the auto knob picks k=3 only when the
    definition side's wildcard floor (min per-position 'N' count x
    scheme width) exceeds AUTO_PRUNE_VERIFY_CELLS — the measured
    boundary between the MLST shape (k=1 faster) and the cgMLST shape
    (k=1 fills a disk with array-carrying verify rows)."""
    from bigsdb_spark.operators.profiles import _auto_prune_positions

    def long_form(rows):
        return spark.createDataFrame(
            rows, "st string, pos int, def_allele string"
        )

    # cg-like: every one of 4 positions carries 3000 'N' definitions
    # -> floor 3000*4 = 12000 > 10000 -> 3
    heavy = long_form(
        [(str(st), p, "N") for st in range(3000) for p in range(4)]
    )
    assert _auto_prune_positions(heavy, 4) == 3

    # same counts but ONE position has no wildcards: the floor is 0
    # (selection can always route through it) -> 1
    gapped = long_form(
        [(str(st), p, "N") for st in range(3000) for p in range(3)]
        + [("x", 3, "7")]
    )
    assert _auto_prune_positions(gapped, 4) == 1

    # MLST-like: 2% 'N' at P=1e3, L=7 -> floor 20*7 = 140 -> 1
    mlst = long_form(
        [(str(st), p, "N") for st in range(20) for p in range(7)]
    )
    assert _auto_prune_positions(mlst, 7) == 1


def test_wildcard_overlength_definitions_ignored_by_both_paths(spark):
    """r11 (ADVICE r10): a definition whose vector is LONGER than
    total_loci is out of contract; previously the unpruned path could
    accept one whose first total_loci positions matched while the
    pruned zip_with verify rejected it.  Both paths now uniformly
    ignore definitions that are not exactly total_loci long."""
    iso = spark.createDataFrame(
        [(1, ["1", "2"]), (2, ["3", "4"])],
        "profile_key int, profile array<string>",
    ).withColumn("profile_md5", F.md5(F.array_join("profile", ",")))
    sch = spark.createDataFrame(
        [
            ("long", ["1", "2", "9"]),   # over-length: prefix matches iso 1
            ("short", ["3"]),            # under-length
            ("ok", ["3", "N"]),          # in contract: matches iso 2
        ],
        "st string, profile array<string>",
    ).withColumn("profile_md5", F.md5(F.array_join("profile", ",")))
    for kwargs in (
        {"prune_candidates": False},
        {"prune_candidates": True, "prune_positions": 1},
        {},  # the default: pruned + auto knob
    ):
        got = assign_scheme_fields(
            iso, sch, allow_missing_loci=True, total_loci=2, **kwargs
        ).collect()
        assert {(r.profile_key, r.st) for r in got} == {(2, "ok")}


def test_multi_designation_membership_semantics(spark):
    """r11 (VERDICT r10 #5): A5 path (b) is positional SET MEMBERSHIP
    (sql/isolatedb.sql:1555-1566 — profile[i]=ANY(designations at
    locus i)), NOT a designation-combination cross-product.  An
    isolate with a paralogous double designation matches every
    definition covered by either allele, with NO pre-expansion."""
    from bigsdb_spark.operators.profiles import assign_scheme_fields_multi

    # isolate 1: two designations at pos 2 -> matches ST a (via "4")
    # AND ST b (via "9"); isolate 2: single designations, matches a
    desig = spark.createDataFrame(
        [
            (1, 0, "1"), (1, 1, "3"), (1, 2, "4"), (1, 2, "9"),
            (2, 0, "1"), (2, 1, "3"), (2, 2, "4"),
            (3, 0, "1"), (3, 1, "3"),  # incomplete: pos 2 missing
        ],
        "profile_key int, pos int, allele string",
    )
    sch = spark.createDataFrame(
        [
            ("a", ["1", "3", "4"]),
            ("b", ["1", "3", "9"]),
            ("c", ["1", "3", "N"]),  # wildcard at pos 2
        ],
        "st string, profile array<string>",
    )
    for prune in (False, True):
        got = {
            (r.profile_key, r.st)
            for r in assign_scheme_fields_multi(
                desig, sch, total_loci=3, allow_missing_loci=False,
                prune_candidates=prune, prune_positions=1 if prune else None,
            ).collect()
        }
        # complete isolates only; the plain ELSE branch
        # (isolatedb.sql:1555-1566) appends NOTHING to the isolate's
        # set, so ST c's 'N' is a literal allele value here and
        # matches neither "4" nor "9" (r12, ADVICE r11 — the r11 form
        # gave 'N' its match-anything meaning in this branch too,
        # which the reference reserves for allow_missing_loci)
        assert got == {(1, "a"), (1, "b"), (2, "a")}

    # ... and a literal 'N' DESIGNATION does match a definition 'N'
    # under the ELSE branch (ordinary allele equality)
    desig_lit = spark.createDataFrame(
        [(9, 0, "1"), (9, 1, "3"), (9, 2, "N")],
        "profile_key int, pos int, allele string",
    )
    for prune in (False, True):
        got = {
            (r.profile_key, r.st)
            for r in assign_scheme_fields_multi(
                desig_lit, sch, total_loci=3, allow_missing_loci=False,
                prune_candidates=prune, prune_positions=1 if prune else None,
            ).collect()
        }
        assert got == {(9, "c")}

    for prune in (False, True):
        got = {
            (r.profile_key, r.st)
            for r in assign_scheme_fields_multi(
                desig, sch, total_loci=3, allow_missing_loci=True,
                prune_candidates=prune, prune_positions=2 if prune else None,
            ).collect()
        }
        # allow-missing (isolatedb.sql:1526-1540): 'N' is appended to
        # the isolate's set at EVERY position, so isolate 3's missing
        # pos 2 is matched by ST c's 'N' — and ONLY by it
        assert got == {
            (1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "c"), (3, "c"),
        }


@pytest.mark.slow
def test_multi_designation_pruned_equals_unpruned_randomized(spark):
    """Randomized paralog corpus (1-5 pct loci with 2 designations,
    'N'-carrying definitions, noise isolates): the pruned membership
    path must return exactly the unpruned rows at k=1 and k=3 and via
    the auto knob, in both allow_missing modes."""
    import random as _random

    from bigsdb_spark.operators.profiles import assign_scheme_fields_multi

    rng = _random.Random(1234)
    total = 6
    vocab = [str(v) for v in range(1, 13)]
    weights = [1.0 / (i + 1) for i in range(len(vocab))]

    def draw():
        return rng.choices(vocab, weights=weights)[0]

    defs = []
    for st in range(1, 41):
        vec = [draw() for _ in range(total)]
        for p in rng.sample(range(total), rng.randint(0, 2)):
            vec[p] = "N"
        defs.append((str(st), vec))
    rows = []
    key = 0
    for _ in range(150):
        key += 1
        src = rng.choice(defs)[1]
        for p, v in enumerate(src):
            if v == "N" and rng.random() < 0.3:
                continue  # leave some positions undesignated
            rows.append((key, p, draw() if v == "N" else v))
            if rng.random() < 0.05:  # paralogous second designation
                rows.append((key, p, draw()))
    desig = spark.createDataFrame(
        rows, "profile_key int, pos int, allele string"
    )
    sch = spark.createDataFrame(defs, "st string, profile array<string>")
    for allow in (False, True):
        base = assign_scheme_fields_multi(
            desig, sch, total_loci=total, allow_missing_loci=allow,
            prune_candidates=False,
        ).collect()
        assert len(base) > 0
        for kw in (
            {"prune_positions": 1, "broadcast_defs": True},
            {"prune_positions": 1, "broadcast_defs": False},
            {"prune_positions": 3, "broadcast_defs": True},
            {"prune_positions": 3, "broadcast_defs": False},
            {},  # auto knobs (probe memoized per plan)
        ):
            pruned = assign_scheme_fields_multi(
                desig, sch, total_loci=total, allow_missing_loci=allow,
                prune_candidates=True, **kw,
            ).collect()
            assert {tuple(r) for r in pruned} == {tuple(r) for r in base}


def test_multi_intersect_bitmap_byte_guard(spark, monkeypatch):
    """r13 (VERDICT r12 #3): the intersect plan's driver-built posting
    bitmap is BYTE-guarded, not just row-guarded — when the matrix
    estimate crosses SPARK_GRAFT_INTERSECT_BITMAP_MAX_BYTES the build
    aborts and the dispatcher falls back to the laddered shuffle plan
    with identical output (and no mapInPandas node in the plan)."""
    from bigsdb_spark.operators.profiles import assign_scheme_fields_multi

    desig = spark.createDataFrame(
        [
            (1, 0, "1"), (1, 1, "3"), (1, 2, "4"), (1, 2, "9"),
            (2, 0, "1"), (2, 1, "3"), (2, 2, "4"),
        ],
        "profile_key int, pos int, allele string",
    )
    sch = spark.createDataFrame(
        [("a", ["1", "3", "4"]), ("b", ["1", "3", "9"])],
        "st string, profile array<string>",
    )

    def build():
        return assign_scheme_fields_multi(
            desig, sch, total_loci=3, allow_missing_loci=False,
            prune_candidates=True, broadcast_defs=True,
        )

    base = build()
    assert "MapInPandas" in base._jdf.queryExecution().analyzed().toString()
    expect = {(r.profile_key, r.st) for r in base.collect()}
    assert expect == {(1, "a"), (1, "b"), (2, "a")}

    monkeypatch.setenv("SPARK_GRAFT_INTERSECT_BITMAP_MAX_BYTES", "16")
    guarded = build()
    plan = guarded._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan  # fell back to the shuffle plan
    assert {(r.profile_key, r.st) for r in guarded.collect()} == expect


@pytest.mark.slow
def test_candidate_scaled_partitions_law(spark, designations, scheme, tmp_path, monkeypatch):
    """r12 (VERDICT r11 #2): the wildcard path's heavy exchanges scale
    their partition count with the isolate side.  Small sources stay
    on the session defaults (helper returns None, plan unchanged);
    when the source bytes exceed the per-partition budget the cost
    window and verify joins run at the scaled power-of-two count and
    the output rows are identical."""
    import bigsdb_spark.operators.profiles as P

    prof = build_profiles(designations, "isolate_id", "locus", "allele_id")
    # write to parquet so Catalyst's size-only stats are file bytes
    path = str(tmp_path / "dense.parquet")
    prof.write.parquet(path)
    dense = spark.read.parquet(path)

    # tiny source: law stays out of the way
    assert P._candidate_scaled_partitions(dense) is None

    # shrink the per-partition budget so the fixture-sized source
    # triggers the law deterministically
    monkeypatch.setattr(P, "VERIFY_PARTITION_SOURCE_BYTES", 16)
    n_ver = P._candidate_scaled_partitions(dense)
    floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert n_ver is not None and n_ver > floor
    assert n_ver & (n_ver - 1) == 0  # power of two

    base = assign_scheme_fields(
        prof, scheme, allow_missing_loci=True, total_loci=7,
        prune_candidates=True, prune_positions=3,
    )
    scaled = assign_scheme_fields(
        dense, scheme, allow_missing_loci=True, total_loci=7,
        prune_candidates=True, prune_positions=3,
    )
    plan = scaled._jdf.queryExecution().executedPlan().toString()
    # the user repartitions replace the ENSURE_REQUIREMENTS exchanges
    # at the scaled count (REPARTITION_BY_COL is AQE-coalesce-exempt)
    assert f"hashpartitioning(profile_key#" in plan and f", {n_ver})" in plan
    assert {tuple(r) for r in scaled.collect()} == {
        tuple(r) for r in base.collect()
    }
    assert scaled.count() > 0


@pytest.mark.slow
def test_dim_broadcast_mode_equals_default(spark, designations, scheme, monkeypatch):
    """r12 (VERDICT r11 #2): dimension-broadcast mode (broadcast freq
    tables / definition rows / definition arrays + the k-pass
    broadcast-argmin replacing the cost window) must return exactly
    the default plan's rows, for k=1 and k=3, on the fixture and on a
    randomized corpus."""
    import random as _random

    import bigsdb_spark.operators.profiles as P

    prof = build_profiles(designations, "isolate_id", "locus", "allele_id")
    base = {
        tuple(r)
        for r in assign_scheme_fields(
            prof, scheme, allow_missing_loci=True, total_loci=7,
            prune_candidates=True, prune_positions=3,
        ).collect()
    }
    # force the mode on tiny frames
    monkeypatch.setattr(P, "DIM_MODE_MIN_DENSE_BYTES", 1)
    for k_sel in (1, 2, 3):
        got = {
            tuple(r)
            for r in assign_scheme_fields(
                prof, scheme, allow_missing_loci=True, total_loci=7,
                prune_candidates=True, prune_positions=k_sel,
            ).collect()
        }
        assert got == base, f"k={k_sel}"

    rng = _random.Random(1234)
    vocab = 6
    defs = []
    for st in range(40):
        defs.append(
            (
                str(st),
                [
                    "N" if rng.random() < 0.15
                    else str(rng.randint(1, vocab))
                    for _ in range(5)
                ],
            )
        )
    isos = []
    for i in range(120):
        src_ = defs[rng.randrange(len(defs))][1]
        v = [
            str(rng.randint(1, vocab)) if (a == "N" or rng.random() < 0.2)
            else a
            for a in src_
        ]
        isos.append((i, v))
    sch = spark.createDataFrame(defs, "st string, profile array<string>")
    dense = spark.createDataFrame(
        isos, "profile_key int, profile array<string>"
    )
    base2 = {
        tuple(r)
        for r in assign_scheme_fields(
            dense, sch, allow_missing_loci=True, total_loci=5,
            prune_candidates=False,
        ).collect()
    }
    assert len(base2) > 0
    for k_sel in (1, 2, 3, 5):
        got = {
            tuple(r)
            for r in assign_scheme_fields(
                dense, sch, allow_missing_loci=True, total_loci=5,
                prune_candidates=True, prune_positions=k_sel,
            ).collect()
        }
        assert got == base2, f"k={k_sel}"
