"""Sequence-domain scalar functions (SURVEY §2.8 F1-F9).

The reference implements these row-at-a-time in Perl
(lib/BIGSdb/Utils.pm); here every function is a Column expression
(translate/regexp/length built-ins → whole-stage codegen), except
DNA→peptide translation which needs a codon map and uses a vectorized
pandas UDF (Arrow-batched — the sanctioned slow path).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# F1 — reverse complement (Utils.pm:39): complement via translate, then
# reverse. Handles upper/lower ACGT + IUPAC ambiguity codes like the
# reference's tr/GATCUgatcu.../CTAGActaga.../.
_COMP_FROM = "ACGTUacgtuRYKMrykmBVDHbvdh"
_COMP_TO = "TGCAAtgcaaYRMKyrmkVBHDvbhd"


def reverse_complement(col: Column) -> Column:
    return F.reverse(F.translate(col, _COMP_FROM, _COMP_TO))


# F2 — validity checks (Utils.pm:50,67)
def is_valid_dna(col: Column, allow_ambiguous: bool = False) -> Column:
    pattern = "^[ACGTURYSWKMBDHVNacgturyswkmbdhvn]+$" if allow_ambiguous else "^[ACGTUacgtu]+$"
    return col.rlike(pattern)


def is_valid_peptide(col: Column) -> Column:
    return F.upper(col).rlike("^[GALMFWKQESPVICYHRNDT*]+$")


def sequence_type(col: Column) -> Column:
    """'DNA' when >=90% of chars are ACGTN (Utils.pm:105). The empty
    string is 'peptide' (guarded: a bare length-0 division would abort
    the whole job under ANSI mode's DIVIDE_BY_ZERO)."""
    up = F.upper(col)
    acgt = F.length(F.regexp_replace(up, "[^ACGTN]", ""))
    return F.when(
        (F.length(up) > 0) & (acgt / F.length(up) >= 0.9), F.lit("DNA")
    ).otherwise(F.lit("peptide"))


# F5 — composition stats (SeqbinBreakdown.pm:488-530)
def gc_content(col: Column) -> Column:
    """%GC over unambiguous bases; NULL when there are none (an all-N
    masked contig is routine — ANSI mode would otherwise kill the job
    with DIVIDE_BY_ZERO)."""
    up = F.upper(col)
    gc = F.length(F.regexp_replace(up, "[^GC]", ""))
    atgc = F.length(F.regexp_replace(up, "[^ACGT]", ""))
    return F.when(atgc > 0, F.round(gc / atgc * 100.0, 4))


def n_count(col: Column) -> Column:
    return F.length(F.regexp_replace(F.upper(col), "[^N]", ""))


def gap_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, "[^-]", ""))


# F6 — md5 identity of sequences/profiles (sql/seqdef.sql:358,1151)
def sequence_md5(col: Column) -> Column:
    return F.md5(F.upper(col))


# F3/F4 — CDS check + translation (Utils.pm:74; BioPerl translate).
_CODON_TABLE_1 = {
    # standard genetic code (NCBI table 1)
    **{
        c: aa
        for c, aa in zip(
            [a + b + c for a in "TCAG" for b in "TCAG" for c in "TCAG"],
            "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
        )
    }
}
START_CODONS = ("ATG", "GTG", "TTG")
STOP_CODONS = tuple(c for c, aa in _CODON_TABLE_1.items() if aa == "*")


_translate_udf = None


def translate_dna(col: Column) -> Column:
    """F4: DNA -> peptide, standard code; '?' for unknown codons.
    Arrow-batched pandas UDF (created lazily — pandas_udf needs an
    active SparkSession to parse its return type)."""
    global _translate_udf
    if _translate_udf is None:

        def _tr_series(seq: pd.Series) -> pd.Series:
            def _tr(s):
                if s is None:
                    return None
                s = s.upper().replace("U", "T")
                return "".join(
                    _CODON_TABLE_1.get(s[i : i + 3], "?")
                    for i in range(0, len(s) - 2, 3)
                )

            return seq.map(_tr)

        _translate_udf = pandas_udf(_tr_series, "string")
    return _translate_udf(col)


def is_complete_cds(col: Column, peptide: Column | None = None) -> Column:
    """F3: starts with a start codon, ends with a stop codon, length % 3
    == 0, no internal stop (checked on the translation). Pass
    ``peptide`` when the translation is already materialized in the
    plan to avoid a second pandas-UDF pass over the same sequence."""
    up = F.upper(col)
    starts = F.substring(up, 1, 3).isin(*START_CODONS)
    ends = F.substring(up, -3, 3).isin(*STOP_CODONS)
    len_ok = F.length(up) % 3 == 0
    pep = translate_dna(up) if peptide is None else peptide
    no_internal_stop = ~F.substr(pep, F.lit(1), F.length(pep) - 1).contains("*")
    return starts & ends & len_ok & no_internal_stop
