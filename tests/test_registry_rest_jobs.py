"""Schema registry validation, REST search parsing, job-queue
semantics, and materialization refresh modes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.cache import Materialization, should_use_cache
from bigsdb_spark.jobs import DuplicateJobError, JobService, QuotaExceededError
from bigsdb_spark.plans.rest import BadRequest, paging_links, parse_search
from bigsdb_spark.registry import (
    FieldDef,
    TableDef,
    load_table_def,
    optlist_expansion,
    optlist_predicate,
    validation_errors,
)

TABLE = TableDef(
    "isolates",
    [
        FieldDef("id", "int", required=True),
        FieldDef("country", optlist=["France", "UK [England]", "UK [Scotland]"]),
        FieldDef("year", "int", min=1900, max=2030),
        FieldDef("isolate", regex="^iso-"),
        FieldDef("serogroup", multiple=True),
    ],
)


def test_struct_type_roundtrip():
    st = TABLE.struct_type()
    assert st["id"].nullable is False
    assert st["serogroup"].dataType.simpleString() == "array<string>"
    spec = {"name": "t", "fields": [{"name": "x", "type": "float"}]}
    assert load_table_def(spec).struct_type()["x"].dataType.simpleString() == "double"


def test_validation_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "France", 2010, "iso-1"),
            (None, "Mars", 1850, "bad"),
        ],
        "id int, country string, year int, isolate string",
    )
    errs = validation_errors(df, TABLE).collect()
    assert len(errs) == 1
    assert set(errs[0].errors) == {
        "id: required",
        "country: not in optlist",
        "year: below min",
        "isolate: regex",
    }


def test_optlist_subvalue_expansion(spark):
    assert optlist_expansion(TABLE.field("country"), "UK") == [
        "UK",
        "UK [England]",
        "UK [Scotland]",
    ]
    df = spark.createDataFrame(
        [("UK [England]",), ("France",), ("uk",)], "country string"
    )
    got = df.filter(optlist_predicate(TABLE.field("country"), "uk")).collect()
    assert sorted(r.country for r in got) == ["UK [England]", "uk"]


def test_rest_parse_roundtrip():
    rq = parse_search(
        {
            "field.country": "France",
            "field.year": {"operator": ">", "value": 2015},
            "scheme.1.ST": 5,
            "locus.abcZ": "7",
            "page": 2,
            "page_size": 50,
        },
        TABLE,
    )
    assert len(rq.spec.rows) == 2
    assert rq.spec.offset == 50 and rq.spec.limit == 50
    assert rq.scheme_filters[0][0] == 1
    assert rq.locus_filters[0].field == "abcZ"


def test_rest_typed_errors():
    with pytest.raises(BadRequest, match="unknown field"):
        parse_search({"field.nope": 1}, TABLE)
    with pytest.raises(BadRequest, match="invalid operator"):
        parse_search({"field.year": {"operator": "LIKE", "value": 1}}, TABLE)
    with pytest.raises(BadRequest, match="unknown search category"):
        parse_search({"bogus.key": 1}, TABLE)
    # JSON null (or a {"operator": ...} with no value) must be a typed
    # 400, not a predicate comparing against the string 'None'
    with pytest.raises(BadRequest, match="missing value"):
        parse_search({"field.country": None}, TABLE)
    with pytest.raises(BadRequest, match="missing value"):
        parse_search({"field.year": {"operator": ">"}}, TABLE)
    # malformed paging / sort params are 400s, not raw ValueErrors
    with pytest.raises(BadRequest, match="integers"):
        parse_search({"page": "abc"}, TABLE)
    with pytest.raises(BadRequest, match="bad sort"):
        parse_search({"sort": 5}, TABLE)
    with pytest.raises(BadRequest, match="unknown sort field"):
        parse_search({"sort": "no_such_field"}, TABLE)
    with pytest.raises(BadRequest, match="unknown sort field"):
        parse_search({"sort": "-"}, TABLE)


def test_paging_links():
    assert paging_links(2, 10, 35) == {
        "records": 35, "page": 2, "pages": 4, "previous": 1, "next": 3,
    }


def test_job_queue_priority_fifo_dedup_quota():
    svc = JobService(user_quota=2)
    a = svc.add_job("Breakdown", {"field": "country"}, user="u1", priority=5)
    b = svc.add_job("Export", {"fmt": "tsv"}, user="u1", priority=1)
    with pytest.raises(DuplicateJobError):
        svc.add_job("Breakdown", {"field": "country"}, user="u2")
    with pytest.raises(QuotaExceededError):
        svc.add_job("Other", {"x": 1}, user="u1")
    # priority first
    assert svc.next_job().job_id == b.job_id
    assert svc.next_job().job_id == a.job_id
    svc.finish(a.job_id)
    svc.finish(b.job_id)
    # same-fingerprint resubmission allowed once finished
    c = svc.add_job("Breakdown", {"field": "country"}, user="u2")
    done = svc.run_next({"Breakdown": lambda field: f"ran:{field}"})
    assert done.job_id == c.job_id and done.result == "ran:country"
    assert svc.status(c.job_id)["status"] == "finished"


def test_job_failure_is_status():
    svc = JobService()
    svc.add_job("Boom", {}, user="u1")
    done = svc.run_next({"Boom": lambda: 1 / 0})
    assert done.status == "failed" and "ZeroDivisionError" in done.result


def test_job_admission_exactly_once_under_concurrency():
    """VERDICT r4 task 9: fingerprint dedup and quotas were only tested
    sequentially; the admission scan is check-then-act, so concurrent
    submitters must serialize through it.  N threads race the SAME
    fingerprint — exactly one admission may win; then threads race
    distinct fingerprints for one user — exactly quota admissions win."""
    import threading

    svc = JobService(user_quota=2)
    n_threads = 16
    results: list[object] = [None] * n_threads
    barrier = threading.Barrier(n_threads)

    def submit_dup(i):
        barrier.wait()  # maximize overlap inside add_job
        try:
            results[i] = svc.add_job("BURST", {"scheme": 1}, user=f"u{i}")
        except DuplicateJobError as e:
            results[i] = e

    threads = [
        threading.Thread(target=submit_dup, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    admitted = [r for r in results if not isinstance(r, Exception)]
    assert len(admitted) == 1  # exactly-once admission
    assert sum(isinstance(r, DuplicateJobError) for r in results) == n_threads - 1

    # quota race: one user, distinct params, quota=2, one slot already
    # taken by nothing (fresh service) -> exactly 2 admissions
    svc2 = JobService(user_quota=2)
    results2: list[object] = [None] * n_threads
    barrier2 = threading.Barrier(n_threads)

    def submit_quota(i):
        barrier2.wait()
        try:
            results2[i] = svc2.add_job("Export", {"i": i}, user="alice")
        except QuotaExceededError as e:
            results2[i] = e

    threads = [
        threading.Thread(target=submit_quota, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    admitted2 = [r for r in results2 if not isinstance(r, Exception)]
    assert len(admitted2) == 2  # quota holds exactly under the race
    # dequeue race: concurrent workers never start the same job
    starts: list[object] = []
    lock = threading.Lock()

    def worker():
        j = svc2.next_job()
        with lock:
            starts.append(j)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    started = [j.job_id for j in starts if j is not None]
    assert len(started) == 2 and len(set(started)) == 2


def test_materialization_swap_and_incremental(spark, tmp_path):
    mat = Materialization(spark, str(tmp_path), "scheme_fields_1")
    df1 = spark.createDataFrame([(1, "ST1"), (2, "ST2")], "id int, st string")
    v0 = mat.refresh_full(df1)
    assert mat.read().count() == 2 and v0 == "v_000000"
    # incremental: isolate 2 changed, isolate 3 added
    changed = spark.createDataFrame([(2,), (3,)], "id int")
    recomputed = spark.createDataFrame([(2, "ST9"), (3, "ST3")], "id int, st string")
    mat.refresh_incremental(recomputed, changed, "id")
    got = {r.id: r.st for r in mat.read().collect()}
    assert got == {1: "ST1", 2: "ST9", 3: "ST3"}
    # old version still intact on disk until vacuumed (atomic swap)
    assert mat.current_version() == "v_000001"


def test_cache_policy_thresholds():
    assert not should_use_cache(7)
    assert should_use_cache(1000)


def test_plugin_registry_inline_and_job_duality(spark):
    """§2.10 (Plugin.pm): one declared (df, params) -> artifacts operator
    runs BOTH inline and through the job queue with identical results."""
    from bigsdb_spark.jobs import JobService
    from bigsdb_spark.plugins import DEFAULT_REGISTRY

    df = spark.createDataFrame(
        [("FR",), ("FR",), ("UK",)], "country string"
    )
    inline = DEFAULT_REGISTRY.run_inline("FieldBreakdown", df, field="country")
    inline_rows = {(r.label, r.n) for r in inline.collect()}
    assert inline_rows == {("FR", 2), ("UK", 1)}

    jobs = JobService()
    job = DEFAULT_REGISTRY.submit(
        jobs, "FieldBreakdown", user="alice", params={"field": "country"}
    )
    done = DEFAULT_REGISTRY.run_queued(jobs, selection_for=lambda j: df)
    assert done.job_id == job.job_id and done.status == "finished"
    assert {(r.label, r.n) for r in done.result.collect()} == inline_rows

    # unknown plugin fails at submit; missing columns fail the job,
    # not the service
    import pytest

    with pytest.raises(KeyError):
        DEFAULT_REGISTRY.submit(jobs, "NoSuchPlugin", user="alice")
    DEFAULT_REGISTRY.register_plugin(
        "NeedsCol", "analysis", lambda d: d, requires=("nope",)
    )
    DEFAULT_REGISTRY.submit(jobs, "NeedsCol", user="bob")
    failed = DEFAULT_REGISTRY.run_queued(jobs, selection_for=lambda j: df)
    assert failed.status == "failed" and "nope" in str(failed.result)


def test_round2_plugins_run_inline(spark):
    """The round-2 analyses run through the plugin contract: one
    registry call returns the GenomeComparator artifact bundle."""
    from bigsdb_spark.plugins import DEFAULT_REGISTRY

    desig = spark.createDataFrame(
        [(1, "A", "1"), (2, "A", "2"), (1, "B", "1"), (2, "B", "1")],
        "isolate_id int, locus string, allele_id string",
    )
    arts = DEFAULT_REGISTRY.run_inline("GenomeComparator", desig)
    la = {r["locus"]: r for r in arts["locus_attributes"].collect()}
    assert la["A"]["variable"] and not la["B"]["variable"]
    assert arts["distances"].collect()[0]["differences"] == 1
    assert arts["unique_strains"].count() == 2

    grid = DEFAULT_REGISTRY.run_inline("GenePresence", desig, loci=["A", "B", "C"])
    assert grid.count() == 6


def test_rest_paging_params_reject_non_integer_types():
    """Regression (ADVICE r2): int(True) -> 1 and int(2.9) -> 2 silently
    coerced JSON booleans/floats; paging params must be actual ints."""
    import pytest

    for bad in (True, False, 2.9, "2", [1]):
        with pytest.raises(BadRequest):
            parse_search({"page": bad}, TABLE)
        with pytest.raises(BadRequest):
            parse_search({"page_size": bad}, TABLE)
    # actual ints still fine
    rq = parse_search({"page": 2, "page_size": 10}, TABLE)
    assert rq.spec.offset == 10 and rq.spec.limit == 10


def test_rest_isolates_list_route(spark):
    from bigsdb_spark.plans.rest import route_isolates_list

    view = spark.createDataFrame(
        [(i, f"2024-01-{(i % 27) + 1:02d}") for i in range(1, 36)],
        "id int, datestamp string",
    )
    got = route_isolates_list(
        view, "/db/test", page=2, page_size=10, datestamp_col="datestamp"
    )
    assert got["records"] == 35
    assert got["last_updated"] == "2024-01-27"
    assert got["paging"] == {
        "records": 35, "page": 2, "pages": 4, "previous": 1, "next": 3,
    }
    # page 2 of ids ordered by id
    assert got["isolates"][0] == "/db/test/isolates/11"
    assert len(got["isolates"]) == 10


def test_rest_isolate_record_route(spark):
    from bigsdb_spark.plans.rest import NotFound, route_isolate_record

    view = spark.createDataFrame(
        [(1, "France", 2020, 5, None), (2, None, 2021, 6, "x")],
        "id int, country string, year int, sender int, note string",
    )
    table = TableDef(
        "iso",
        [
            FieldDef("id", "int", required=True),
            FieldDef("country"),
            FieldDef("year", "int"),
            FieldDef("sender", "int"),
            FieldDef("note"),
        ],
    )
    sb = spark.createDataFrame(
        [(1, 12, 34567, 2200, 4)],
        "isolate_id int, contigs int, total_length long, n50 int, l50 int",
    )
    desig = spark.createDataFrame(
        [(1, "abcZ", "1"), (1, "adk", "2")],
        "isolate_id int, locus string, allele_id string",
    )
    got = route_isolate_record(
        view, table, 1, "/db/test", seqbin_stats=sb, designations=desig
    )
    assert got["provenance"] == {
        "id": 1,
        "country": "France",
        "year": 2020,
        "sender": "/db/test/users/5",  # user URI, not the raw int
        # note is NULL -> omitted
    }
    assert got["sequence_bin"]["contig_count"] == 12
    assert got["sequence_bin"]["N50"] == 2200
    assert got["allele_designations"]["designation_count"] == 2
    # record without seqbin rows omits the section
    got2 = route_isolate_record(
        view, table, 2, "/db/test", seqbin_stats=sb, designations=desig
    )
    assert "sequence_bin" not in got2 and "allele_designations" not in got2
    with pytest.raises(NotFound):
        route_isolate_record(view, table, 99, "/db/test")


def test_rest_fields_route():
    from bigsdb_spark.plans.rest import route_fields

    got = route_fields(TABLE, "/db/test")
    by_name = {e["name"]: e for e in got}
    assert by_name["id"]["required"] is True
    assert by_name["year"]["min"] == 1900 and by_name["year"]["max"] == 2030
    assert by_name["country"]["allowed_values"] == [
        "France", "UK [England]", "UK [Scotland]",
    ]
    assert by_name["isolate"]["regex"] == "^iso-"
    assert by_name["year"]["breakdown"] == "/db/test/fields/year/breakdown"


def test_rest_scheme_route(spark):
    from bigsdb_spark.plans.rest import route_scheme

    profs = spark.createDataFrame([(1,), (2,), (3,)], "profile_key int")
    got = route_scheme(1, "MLST", ["adk", "abcZ"], "/db/test", profiles=profs)
    assert got["locus_count"] == 2
    assert got["loci"] == ["/db/test/loci/abcZ", "/db/test/loci/adk"]
    assert got["profile_count"] == 3


def test_rest_genomes_list_route(spark):
    from bigsdb_spark.plans.rest import route_genomes_list

    view = spark.createDataFrame(
        [(i,) for i in range(1, 11)], "id int"
    )
    sb = spark.createDataFrame(
        [(i, 2_000_000 if i % 2 == 0 else 50_000) for i in range(1, 11)],
        "isolate_id int, total_length long",
    )
    got = route_genomes_list(view, sb, "/db/test", page=1, page_size=3)
    assert got["records"] == 5  # even ids only
    assert got["isolates"] == [
        "/db/test/isolates/2", "/db/test/isolates/4", "/db/test/isolates/6",
    ]
    assert got["paging"]["pages"] == 2


def test_rest_sequences_overview_and_loci(spark):
    from bigsdb_spark.plans.rest import (
        NotFound,
        route_alleles_list,
        route_loci_list,
        route_locus_record,
        route_sequences_overview,
    )

    ls = spark.createDataFrame(
        [
            ("abcZ", 120, 400, 480, "2024-03-01"),
            ("adk", 95, 410, 470, "2024-05-02"),
            ("aroE", 200, 390, 460, "2024-04-15"),
        ],
        "locus string, allele_count long, min_length long, max_length long,"
        " datestamp string",
    )
    got = route_sequences_overview(ls, "/db/test")
    assert got["records"] == 415
    assert got["last_updated"] == "2024-05-02"
    assert got["loci"] == "/db/test/loci"

    lst = route_loci_list(ls, "/db/test", page=1, page_size=2)
    assert lst["records"] == 3 and lst["paging"]["next"] == 2
    assert lst["loci"] == ["/db/test/loci/abcZ", "/db/test/loci/adk"]

    rec = route_locus_record(ls, "adk", "/db/test")
    assert rec["allele_count"] == 95 and rec["min_length"] == 410
    assert rec["alleles"] == "/db/test/loci/adk/alleles"
    import pytest as _pytest

    with _pytest.raises(NotFound):
        route_locus_record(ls, "nope", "/db/test")

    al = spark.createDataFrame(
        [("adk", "2"), ("adk", "10"), ("adk", "1"), ("abcZ", "1")],
        "locus string, allele_id string",
    )
    alst = route_alleles_list(al, "adk", "/db/test", page_size=10)
    # numeric ordering, not lexicographic ('10' after '2')
    assert alst["alleles"] == [
        "/db/test/loci/adk/alleles/1",
        "/db/test/loci/adk/alleles/2",
        "/db/test/loci/adk/alleles/10",
    ]


def test_rest_profiles_routes(spark):
    from bigsdb_spark.plans.rest import (
        NotFound,
        route_profile_record,
        route_profiles_list,
    )

    profs = spark.createDataFrame(
        [
            ("10", ["1", "2"], "clonal_complex_A", 5, "2024-01-01"),
            ("2", ["1", "3"], None, 7, "2024-02-01"),
            ("1", ["4", "2"], "clonal_complex_B", 5, "2024-03-01"),
        ],
        "ST string, profile array<string>, clonal_complex string,"
        " sender long, datestamp string",
    )
    lst = route_profiles_list(profs, 1, "/db/test", pk_col="ST", page_size=2)
    assert lst["records"] == 3
    assert lst["last_updated"] == "2024-03-01"
    # integer pk ordering: 1, 2 (not '1', '10')
    assert lst["profiles"] == [
        "/db/test/schemes/1/profiles/1",
        "/db/test/schemes/1/profiles/2",
    ]

    rec = route_profile_record(
        profs, 1, "10", ["adk", "abcZ"], "/db/test", pk_col="ST"
    )
    assert rec["alleles"] == [
        "/db/test/loci/adk/alleles/1",
        "/db/test/loci/abcZ/alleles/2",
    ]
    assert rec["ST"] == 10  # pk int-cast
    assert rec["sender"] == "/db/test/users/5"
    assert rec["clonal_complex"] == "clonal_complex_A"
    import pytest as _pytest

    with _pytest.raises(NotFound):
        route_profile_record(profs, 1, "99", ["adk"], "/db/test", pk_col="ST")


@pytest.mark.slow
def test_rest_designation_and_group_routes(spark):
    from bigsdb_spark.plans.rest import (
        route_allele_designations,
        route_allele_ids,
        route_classification_group_profiles,
        route_classification_groups,
        route_contigs_list,
    )

    des = spark.createDataFrame(
        [
            (7, "adk", "2"),
            (7, "abcZ", "1"),
            (7, "adk", "10"),
            (8, "adk", "1"),
        ],
        "isolate_id long, locus string, allele_id string",
    )
    view = spark.createDataFrame([(7,), (8,)], "id long")
    d = route_allele_designations(des, 7, "/db/test", view=view)
    assert d["records"] == 2  # distinct loci
    assert d["allele_designations"] == [
        "/db/test/isolates/7/allele_designations/abcZ",
        "/db/test/isolates/7/allele_designations/adk",
    ]
    ids = route_allele_ids(des, 7, "/db/test", view=view)
    assert ids["records"] == 3
    # numeric allele ordering within a locus: 2 before 10
    assert ids["allele_ids"] == [
        {"abcZ": "1"},
        {"adk": "2"},
        {"adk": "10"},
    ]
    # unknown isolate against the view -> the reference's 404
    import pytest as _pytest

    from bigsdb_spark.plans.rest import NotFound

    with _pytest.raises(NotFound):
        route_allele_designations(des, 999, "/db/test", view=view)
    with _pytest.raises(NotFound):
        route_allele_ids(des, 999, "/db/test", view=view)

    cgp = spark.createDataFrame(
        [(1, 4, "10"), (1, 4, "2"), (1, 9, "7"), (2, 1, "1")],
        "cg_scheme_id long, group_id long, profile_id string",
    )
    g = route_classification_groups(cgp, 1, "/db/test")
    assert g["records"] == 2
    assert g["groups"] == [
        "/db/test/classification_schemes/1/groups/4",
        "/db/test/classification_schemes/1/groups/9",
    ]
    gp = route_classification_group_profiles(cgp, 1, 4, 1, "/db/test")
    assert gp["records"] == 2
    # integer ordering of profile ids: 2 before 10
    assert gp["profiles"] == [
        "/db/test/schemes/1/profiles/2",
        "/db/test/schemes/1/profiles/10",
    ]

    sb = spark.createDataFrame(
        [(100, 7), (101, 7), (102, 8)], "id long, isolate_id long"
    )
    c = route_contigs_list(sb, 7, "/db/test", view=view)
    assert c["records"] == 2
    assert c["contigs"] == ["/db/test/contigs/100", "/db/test/contigs/101"]
    with _pytest.raises(NotFound):
        route_contigs_list(sb, 999, "/db/test", view=view)


def test_rest_profile_record_mixed_pk_types(spark):
    # an int profile_id against a string pk column with a non-numeric
    # row must match (string compare), not abort under ANSI mode
    from bigsdb_spark.plans.rest import route_profile_record

    profs = spark.createDataFrame(
        [("10", ["1"]), ("ST-old", ["2"])],
        "ST string, profile array<string>",
    )
    rec = route_profile_record(profs, 1, 10, ["adk"], "/db/test", pk_col="ST")
    assert rec["ST"] == 10
    rec2 = route_profile_record(
        profs, 1, "ST-old", ["adk"], "/db/test", pk_col="ST"
    )
    assert rec2["ST"] == "ST-old"


def test_rest_field_values_and_breakdown(spark):
    from bigsdb_spark.plans.rest import (
        NotFound,
        route_field_breakdown,
        route_field_values,
    )

    view = spark.createDataFrame(
        [
            (1, "France"),
            (2, "UK [England]"),
            (3, "France"),
            (4, None),
            (5, "France"),
        ],
        "id int, country string",
    )
    vals = route_field_values(view, TABLE, "country")
    assert vals["records"] == 2  # distinct non-NULL values
    assert vals["values"] == ["France", "UK [England]"]

    bd = route_field_breakdown(view, TABLE, "country")
    assert bd == {"France": 3, "UK [England]": 1}  # NULLs excluded

    # genomes=True: restrict to isolates with a big-enough sequence bin
    sb = spark.createDataFrame(
        [(1, 2_000_000), (2, 500), (3, 1_500_000)],
        "isolate_id int, total_length long",
    )
    bd2 = route_field_breakdown(view, TABLE, "country", seqbin_stats=sb, genomes=True)
    assert bd2 == {"France": 2}

    import pytest as _pytest

    with _pytest.raises(NotFound):
        route_field_values(view, TABLE, "nope")
    with _pytest.raises(NotFound):
        route_field_breakdown(view, TABLE, "nope")


def test_rest_users_and_curators(spark):
    import pytest
    from bigsdb_spark.plans.rest import (
        BadRequest,
        NotFound,
        route_curators,
        route_user_record,
    )

    users = spark.createDataFrame(
        [
            (1, "Keith", "Jolley", "Oxford", "k@x.org", "curator"),
            (2, "Ann", "Smith", "Leeds", "a@x.org", "user"),
            (3, "Bob", "Admin", "Oslo", "b@x.org", "admin"),
            (-1, "auto", "tagger", "", None, "user"),
        ],
        "id int, first_name string, surname string, affiliation string, "
        "email string, status string",
    )
    rec = route_user_record(users, 1, "/db/test")
    assert rec == {
        "id": 1, "first_name": "Keith", "surname": "Jolley",
        "affiliation": "Oxford", "email": "k@x.org",
    }
    # privacy: plain users lose the email field, curators keep it
    assert "email" not in route_user_record(users, 2, "/db/test", privacy=True)
    assert "email" in route_user_record(users, 1, "/db/test", privacy=True)
    assert "email" not in route_user_record(users, 1, "/db/test", hide_emails=True)
    with pytest.raises(BadRequest):
        route_user_record(users, "x", "/db/test")
    with pytest.raises(NotFound):
        route_user_record(users, 99, "/db/test")
    cur = route_curators(users, "/db/test")
    # id>0 guard drops the autotagger pseudo-user; user status excluded
    assert cur == {
        "records": 2,
        "curators": ["/db/test/users/1", "/db/test/users/3"],
    }


@pytest.mark.slow
def test_rest_projects(spark):
    import pytest
    from bigsdb_spark.plans.rest import (
        BadRequest,
        NotFound,
        route_project_isolates,
        route_project_record,
        route_projects_list,
    )

    projects = spark.createDataFrame(
        [
            (1, "EU surveillance", False),
            (2, "private study", True),
            (3, "empty project", False),
        ],
        "id int, short_description string, private boolean",
    )
    members = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99), (2, 10), (3, 98)],
        "project_id int, isolate_id int",
    )
    view = spark.createDataFrame([(10,), (11,), (12,)], "id int")

    got = route_projects_list(projects, members, view, "/db/test")
    # private project hidden; project 3's only member (98) is outside
    # the view -> dropped like the reference's zero-count skip
    assert got == {
        "records": 1,
        "projects": [
            {"project": "/db/test/projects/1", "description": "EU surveillance"}
        ],
    }
    # membership unlocks the private project
    got = route_projects_list(
        projects, members, view, "/db/test", user_project_ids=[2]
    )
    assert got["records"] == 2

    rec = route_project_record(projects, members, view, 1, "/db/test")
    assert rec["isolates"] == "/db/test/projects/1/isolates"
    with pytest.raises(NotFound):
        route_project_record(projects, members, view, 9, "/db/test")
    with pytest.raises(BadRequest):
        route_project_isolates(projects, members, view, True, "/db/test")

    iso = route_project_isolates(projects, members, view, 1, "/db/test")
    # member 99 is not in the view and must not leak
    assert iso["records"] == 2
    assert iso["isolates"] == ["/db/test/isolates/10", "/db/test/isolates/11"]


def test_rest_project_dataset(spark):
    from bigsdb_spark.plans.rest import route_project_dataset

    projects = spark.createDataFrame(
        [(1, "study", False)], "id int, short_description string, private boolean"
    )
    members = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99)], "project_id int, isolate_id int"
    )
    view = spark.createDataFrame(
        [(10, "France", 2020), (11, "Spain", None), (12, "Italy", 2021)],
        "id int, country string, year int",
    )
    des = spark.createDataFrame(
        [(10, "abcZ", "4"), (10, "abcZ", "2"), (11, "adk", "7")],
        "isolate_id int, locus string, allele_id string",
    )
    got = route_project_dataset(
        projects, members, view, 1, "/db/test",
        designations=des.withColumnRenamed("isolate_id", "id"),
        loci=["abcZ", "adk"],
    )
    assert got["records"] == 2  # member 99 not in view
    recs = {r["id"]: r for r in got["dataset"]}
    assert recs[10]["abcZ"] == "2;4"  # sorted multi-designation join
    assert "year" not in recs[11]     # NULLs omitted per record
    assert recs[11]["adk"] == "7"


@pytest.mark.slow
def test_curation_queue_digests(spark):
    import datetime as dt

    from bigsdb_spark.operators.curation_queue import (
        curator_digests,
        digest_due,
        nag_counts,
        route_submissions,
    )

    subs = spark.createDataFrame(
        [
            ("S1", "alleles", "pending", 50, dt.date(2026, 8, 1), "abcZ", None),
            ("S2", "alleles", "pending", 51, dt.date(2026, 8, 10), "adk", None),
            ("S3", "profiles", "pending", 50, dt.date(2026, 8, 5), None, 1),
            ("S4", "isolates", "pending", 52, dt.date(2026, 8, 2), None, None),
            ("S5", "alleles", "closed", 50, dt.date(2026, 7, 1), "abcZ", None),
        ],
        "submission_id string, type string, status string, submitter int, "
        "date_submitted date, locus string, scheme_id int",
    )
    lc = spark.createDataFrame([("abcZ", 1), ("adk", 2)], "locus string, curator_id int")
    sc = spark.createDataFrame([(1, 1)], "scheme_id int, curator_id int")
    perms = spark.createDataFrame([(3,)], "curator_id int")
    routed = route_submissions(subs, lc, sc, perms)
    got = {
        (r["curator_id"], r["submission_id"]) for r in routed.collect()
    }
    # closed S5 excluded; each submission reaches only entitled curators
    assert got == {(1, "S1"), (2, "S2"), (1, "S3"), (3, "S4")}

    now = dt.datetime(2026, 8, 14, 12, 0)
    prefs = spark.createDataFrame(
        [
            (1, None, 1440),                                  # never digested: due
            (2, dt.datetime(2026, 8, 14, 11, 30), 1440),      # recent: not due
            (3, dt.datetime(2026, 8, 10, 0, 0), 60),          # overdue
        ],
        "curator_id int, last_digest timestamp, digest_interval int",
    )
    assert {r[0] for r in digest_due(prefs, now).collect()} == {1, 3}

    dig = {r["curator_id"]: r for r in curator_digests(routed, prefs, now).collect()}
    # curator 3's only submission (S4, Aug 2) predates their Aug 10
    # digest -> nothing new to report; curator 1 never digested
    assert set(dig) == {1}
    assert dig[1]["n_pending"] == 2 and dig[1]["n_alleles"] == 1
    assert dig[1]["submission_ids"] == ["S1", "S3"]  # oldest first

    nags = {r["curator_id"]: r["n_pending"] for r in nag_counts(routed).collect()}
    assert nags == {1: 2, 2: 1, 3: 1}
    old = nag_counts(routed, older_than=dt.date(2026, 8, 3)).collect()
    assert {(r["curator_id"], r["n_pending"]) for r in old} == {(1, 1), (3, 1)}


def test_curator_digest_since_last_digest_only(spark):
    """A digest reports only submissions since that curator's last
    digest — not the whole pending backlog every time."""
    import datetime as dt

    from bigsdb_spark.operators.curation_queue import (
        curator_digests,
        route_submissions,
    )

    subs = spark.createDataFrame(
        [
            ("OLD", "alleles", "pending", 50, dt.date(2026, 7, 1), "abcZ", None),
            ("NEW", "alleles", "pending", 50, dt.date(2026, 8, 13), "abcZ", None),
        ],
        "submission_id string, type string, status string, submitter int, "
        "date_submitted date, locus string, scheme_id int",
    )
    lc = spark.createDataFrame([("abcZ", 1)], "locus string, curator_id int")
    routed = route_submissions(subs, locus_curators=lc)
    prefs = spark.createDataFrame(
        [(1, dt.datetime(2026, 8, 1, 0, 0), 60)],
        "curator_id int, last_digest timestamp, digest_interval int",
    )
    dig = curator_digests(routed, prefs, dt.datetime(2026, 8, 14, 12, 0)).collect()
    assert len(dig) == 1
    assert dig[0]["submission_ids"] == ["NEW"]  # OLD already digested


def test_rest_job_routes(spark):
    import pytest as _pytest

    from bigsdb_spark.jobs import JobService
    from bigsdb_spark.plans.rest import (
        NotFound,
        route_job_record,
        route_jobs_list,
        route_jobs_summary,
    )

    svc = JobService(user_quota=5)
    j1 = svc.add_job("breakdown", {"field": "country"}, user="alice")
    j2 = svc.add_job("export", {"fields": ["id"]}, user="bob")
    svc.update_progress(j1.job_id, 50, "halfway")
    svc.finish(j2.job_id, result="ok")

    summary = route_jobs_summary(svc)
    assert summary["records"] == 2
    assert summary["by_status"].get("finished") == 1

    mine = route_jobs_list(svc, user="alice")
    assert mine["records"] == 1 and mine["jobs"][0]["percent_complete"] == 50

    rec = route_job_record(svc, j2.job_id)
    assert rec["status"] == "finished"
    with _pytest.raises(NotFound):
        route_job_record(svc, 999)
