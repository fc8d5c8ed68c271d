"""FlavoTyper wrapper (operators/flavotyper.py): per-genome tool
fan-out, the padded typing table, and the analysis_results upsert —
against a hand-computed fake tool (no real binary in this container;
the TSV contract is what's pinned, like the BLAST outfmt-6 one)."""

from __future__ import annotations

import json
import sys

import pyspark.sql.functions as F

from bigsdb_spark.operators.flavotyper import (
    flavotyper_table,
    run_flavotyper,
    upsert_analysis_results,
)

# Fake flavotyper honoring the pipe contract (FASTA on stdin, 2-line
# TSV on stdout): serotype Th1 iff the genome contains TACGA, and the
# genotype column is OMITTED for short genomes — exercising the
# row-padding rule (FlavoTyper.pm:250-257).
_FAKE = (
    "import sys\n"
    "seq = ''.join(l.strip() for l in sys.stdin if not l.startswith('>'))\n"
    "sero = 'Th1' if 'TACGA' in seq else 'Th2'\n"
    "if len(seq) < 20:\n"
    "    print('strain\\tserotype\\tgenotype')\n"
    "    print('g\\t' + sero)\n"
    "else:\n"
    "    print('strain\\tserotype\\tgenotype')\n"
    "    print('g\\t' + sero + '\\tgt-' + str(len(seq) % 7))\n"
)
FAKE_CMD = [sys.executable, "-c", _FAKE]


def _contigs(spark):
    return spark.createDataFrame(
        [
            (1, "ACGTACGATTTTACCCGGGAAA"),   # has TACGA, len 22 -> gt-1
            (2, "CCCCGGGGTTTTAAAACCGGTT"),   # no TACGA, len 22 -> gt-1
            (3, "ACTACGAGG"),                # has TACGA, short -> padded
        ],
        "isolate_id long, sequence string",
    )


def test_run_flavotyper_results_json(spark):
    rows = {
        r["isolate_id"]: r
        for r in run_flavotyper(
            _contigs(spark), command=FAKE_CMD, version="1.0.0"
        ).collect()
    }
    assert all(r["name"] == "FlavoTyper" for r in rows.values())
    doc = json.loads(rows[1]["results"])
    assert doc["version"] == "1.0.0"
    fields = {k: v for f in doc["fields"] for k, v in f.items()}
    assert fields["serotype"] == "Th1" and fields["genotype"] == "gt-1"
    assert json.loads(rows[2]["results"])["fields"][1] == {"serotype": "Th2"}


def test_flavotyper_table_labels_and_pads(spark):
    isolates = spark.createDataFrame(
        [(1, "strainA"), (2, "strainB"), (3, "strainC")],
        "id long, isolate string",
    )
    results = run_flavotyper(_contigs(spark), command=FAKE_CMD, version="1")
    table = flavotyper_table(results, isolates).collect()
    got = {r["isolate_id"]: r for r in table}
    # hand-computed: id, label field substituted for the tool's first
    # column, then the typing columns
    assert got[1]["isolate"] == "strainA" and got[1]["serotype"] == "Th1"
    assert got[2]["serotype"] == "Th2" and got[2]["genotype"] == "gt-1"
    # isolate 3's short row padded with '' genotype, never dropped
    assert got[3]["serotype"] == "Th1" and got[3]["genotype"] == ""
    assert [f for f in table[0].asDict()] == [
        "isolate_id", "isolate", "serotype", "genotype",
    ]


def test_upsert_replaces_only_this_tool(spark):
    existing = spark.createDataFrame(
        [
            (1, "FlavoTyper", '{"old": true}'),
            (1, "Kleborate", '{"keep": true}'),
            (9, "FlavoTyper", '{"untouched": true}'),
        ],
        "isolate_id long, name string, results string",
    )
    fresh = spark.createDataFrame(
        [
            (1, "FlavoTyper", '{"new": true}', None),
            (2, "FlavoTyper", None, "tool failed"),  # failed: no upsert
        ],
        "isolate_id long, name string, results string, err string",
    )
    got = {
        (r["isolate_id"], r["name"]): r["results"]
        for r in upsert_analysis_results(existing, fresh).collect()
    }
    assert got[(1, "FlavoTyper")] == '{"new": true}'
    assert got[(1, "Kleborate")] == '{"keep": true}'
    assert got[(9, "FlavoTyper")] == '{"untouched": true}'
    assert (2, "FlavoTyper") not in got
