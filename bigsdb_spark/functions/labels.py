"""O3: dictionary / Unicode-aware label collation (SURVEY §2.7).

Reference: lib/BIGSdb/Utils.pm:1017 (dictionary_sort — sort by
lower-cased label with non-word characters stripped) and :1029
(unicode_dictionary_sort — Unicode::Collate sort keys), plus
Datastore.pm:2586 (locus display ordering). The reference computes
sort keys row-at-a-time in Perl; here both keys are Catalyst
expressions, so label ordering joins ORDER BY/windows at any scale —
Spark 4 ships UTF8 collation support (``F.collate``), which is the
same UCA ordering Unicode::Collate implements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dictionary_sort_key(label: Column | str) -> Column:
    """Utils.pm:1017 dictionary_sort key: lowercase, non-word chars
    (and underscore) removed — 'PorA_VR1' and 'porA VR1' sort
    identically."""
    return F.lower(F.regexp_replace(label, r"[\W_]+", ""))


def unicode_sort_key(label: Column | str) -> Column:
    """Utils.pm:1029 unicode_dictionary_sort: UCA collation key.
    ``F.collate(_, 'UNICODE')`` sorts with the same Unicode Collation
    Algorithm Unicode::Collate uses (accents near their base letters,
    not after 'z')."""
    col = F.col(label) if isinstance(label, str) else label
    return F.collate(col, "UNICODE")


def order_by_label(
    df: DataFrame, label_col: str, unicode_aware: bool = False
) -> DataFrame:
    """Order a frame by its display label the way the reference orders
    dropdowns and locus lists; ties broken by the raw label for a total
    (stable) order."""
    key = (
        unicode_sort_key(label_col)
        if unicode_aware
        else dictionary_sort_key(label_col)
    )
    return df.orderBy(key, F.col(label_col))
