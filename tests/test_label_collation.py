"""O3 label collation (Utils.pm dictionary_sort /
unicode_dictionary_sort semantics as Catalyst expressions)."""

from __future__ import annotations

from bigsdb_spark.functions.labels import order_by_label


def test_dictionary_sort_strips_nonword_and_case(spark):
    # Utils.pm:1017: keys are lc(label) =~ s/[\W_]+//g
    df = spark.createDataFrame(
        [("PorA_VR2",), ("porA VR1",), ("abcZ",), ("Adk!",)], "label string"
    )
    got = [r[0] for r in order_by_label(df, "label").collect()]
    assert got == ["abcZ", "Adk!", "porA VR1", "PorA_VR2"]


def test_unicode_sort_places_accents_with_base_letters(spark):
    # binary UTF-8 order would put the accented labels after 'z...'
    df = spark.createDataFrame(
        [("zeta",), ("École",), ("apple",), ("école2",)], "label string"
    )
    got = [r[0] for r in order_by_label(df, "label", unicode_aware=True).collect()]
    assert got == ["apple", "École", "école2", "zeta"]


def test_order_is_stable_total(spark):
    # identical dictionary keys ('a-b' vs 'A_b') fall back to raw label
    df = spark.createDataFrame([("a-b",), ("A_b",), ("a_b",)], "label string")
    got = [r[0] for r in order_by_label(df, "label").collect()]
    assert got == sorted(got, key=lambda v: (v.lower().replace("-", "").replace("_", ""), v))
