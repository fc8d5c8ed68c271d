#!/usr/bin/env python
"""Independent LIN-code oracle generator for the d5 gate entry.

A from-scratch, strictly SEQUENTIAL pure-Python reimplementation of the
reference algorithm (scripts/maintenance/lincodes.pl: distance 249-252,
identity binning 499-517 via get_thresholds, increment_lincode 300-330)
run over DuckDB-loaded parquet — no Spark and no imports from
bigsdb_spark, so it shares no code with the operator under test
(operators/lincodes.py batches the distance scans through Spark; this
port resolves one profile at a time, the reference's own shape).

Semantics implemented (same documented adaptation as the operator for
ragged profile vectors — the TPC-H-ish fixture has 1-7 "loci" per
profile, where the reference always has exactly the scheme's count):

- profiles are processed in profile_key ascending order;
- 'N'/'0' alleles are missing (lincodes.pl:186 maps N -> 0); positions
  past the shorter vector's length are missing too;
- diffs = positions where both sides non-missing and unequal
  (lincodes.pl:249); missing_in_either = positions where either side is
  missing (:250), both counted over max(len1, len2) positions;
- distance = 100*diffs/(locus_count - missing_in_either), or 100.0 when
  the denominator is 0 (the reference's inf can never win its strict
  `< min_distance` comparison; 100.0 is the same "never closest");
- locus_count = max profile length (the scheme's locus count analog);
- nearest = strict-min distance, earliest-coded wins ties (:252);
- diffs == 0 at the nearest -> reuse its code verbatim (:258-260);
- first profile gets all zeros (:194);
- identity = 100 - min_distance binned against 100*(L-d)/L per diff
  threshold d in scheme order (:499-517); threshold_index = thresholds
  passed; capped at n_components-1 (the reference's unchecked indexing
  would read past the scheme length);
- threshold_index == 0 -> new top lineage (max first component + 1),
  else inherit threshold_index components from the nearest code and
  increment the component at threshold_index among codes sharing that
  prefix (increment_lincode :300-330).

Usage:
    python tools/lincode_oracle.py /root/testdata/sf0.001 /root/testdata/sf0.01

Prints the expected assignments per sf dir and writes the combined
discriminated VALUES oracle to bigsdb_spark/inventory/_lincode_expected.py.
"""

from __future__ import annotations

import sys

import duckdb

THRESHOLDS = [2, 1]  # the d5 entry's scheme diff thresholds
MISSING = {"N", "0"}


def load_profiles(sf_dir: str) -> list[tuple[str, list[str]]]:
    """(profile_key, profile) in assignment order, exactly the d5
    entry's anchor: lineitem % 40 == 0, < 4000; vector ordered by
    (l_linenumber, l_returnflag); key = zero-padded orderkey."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT lpad(CAST(l_orderkey AS VARCHAR), 20, '0') AS profile_key,
               list(l_returnflag ORDER BY l_linenumber, l_returnflag) AS profile
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        WHERE l_orderkey % 40 = 0 AND l_orderkey < 4000
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    con.close()
    return [(k, list(p)) for k, p in rows]


def diffs_and_mie(p1: list[str], p2: list[str]) -> tuple[int, int]:
    n = max(len(p1), len(p2))
    diffs = mie = 0
    for i in range(n):
        a = p1[i] if i < len(p1) else None
        b = p2[i] if i < len(p2) else None
        a_miss = a is None or a in MISSING
        b_miss = b is None or b in MISSING
        if a_miss or b_miss:
            mie += 1
        elif a != b:
            diffs += 1
    return diffs, mie


def assign(profiles: list[tuple[str, list[str]]]) -> list[tuple[str, list[int]]]:
    if not profiles:
        return []
    locus_count = max(len(p) for _, p in profiles)
    ident_thresholds = [100.0 * (locus_count - d) / locus_count for d in THRESHOLDS]
    n_comp = len(THRESHOLDS)
    coded: list[list[str]] = []
    codes: list[list[int]] = []
    out: list[tuple[str, list[int]]] = []
    for key, prof in profiles:
        if not codes:
            code = [0] * n_comp
        else:
            best = None  # (distance, ins_idx, diffs); j ascending -> strict <
            for j, other in enumerate(coded):
                d, mie = diffs_and_mie(other, prof)
                dist = (
                    100.0 * d / (locus_count - mie)
                    if locus_count > mie
                    else 100.0
                )
                if best is None or dist < best[0]:
                    best = (dist, j, d)
            distance, nearest, diffs = best
            if diffs == 0:
                code = list(codes[nearest])
            else:
                identity = 100.0 - distance
                t_idx = 0
                for t in ident_thresholds:
                    if identity >= t:
                        t_idx += 1
                    else:
                        break
                t_idx = min(t_idx, n_comp - 1)
                if t_idx == 0:
                    code = [max((c[0] for c in codes), default=0) + 1]
                    code += [0] * (n_comp - 1)
                else:
                    prefix = codes[nearest][:t_idx]
                    nxt = (
                        max(
                            (c[t_idx] for c in codes if c[:t_idx] == prefix),
                            default=0,
                        )
                        + 1
                    )
                    code = prefix + [nxt]
                    code += [0] * (n_comp - len(code))
        coded.append(prof)
        codes.append(code)
        out.append((key, code))
    return out


def discriminant(sf_dir: str) -> tuple[int, int]:
    con = duckdb.connect()
    c, s = con.execute(
        f"""
        SELECT count(DISTINCT l_orderkey), sum(DISTINCT l_orderkey)
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        WHERE l_orderkey % 40 = 0 AND l_orderkey < 4000
        """
    ).fetchone()
    con.close()
    return int(c), int(s)


def main(sf_dirs: list[str]) -> None:
    blocks = []
    for sf_dir in sf_dirs:
        expected = assign(load_profiles(sf_dir))
        c, s = discriminant(sf_dir)
        print(f"{sf_dir}: {len(expected)} profiles, discriminant c={c} s={s}")
        for k, code in expected[:5]:
            print(f"  {k} -> {'_'.join(map(str, code))}")
        blocks.append((c, s, expected))
    values = ",\n    ".join(
        f"({c}, {s}, '{k}', '{'_'.join(map(str, code))}')"
        for c, s, expected in blocks
        for k, code in expected
    )
    sql = (
        "WITH _disc AS (\n"
        "    SELECT count(DISTINCT l_orderkey)::BIGINT AS c,\n"
        "           sum(DISTINCT l_orderkey)::BIGINT AS s\n"
        "    FROM lineitem WHERE l_orderkey % 40 = 0 AND l_orderkey < 4000\n"
        "),\n"
        "_exp(c, s, profile_key, lincode) AS (VALUES\n"
        f"    {values}\n"
        ")\n"
        "SELECT profile_key, lincode FROM _exp JOIN _disc USING (c, s)"
    )
    import pathlib

    out_path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "bigsdb_spark" / "inventory" / "_lincode_expected.py"
    )
    with open(out_path, "w") as f:
        f.write(
            '"""GENERATED by tools/lincode_oracle.py — do not edit by hand.\n\n'
            "Expected d5 LIN-code assignments from the independent sequential\n"
            "port, discriminated by the anchor subset's (count, sum) so the\n"
            "one static oracle string is correct at every fixture scale it\n"
            "was generated for (the driver gate runs sf0.01; local checks\n"
            'also run sf0.001).\n"""\n\n'
            f"LINCODE_ORACLE_SQL = '''{sql}'''\n"
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
