#!/usr/bin/env python3
"""Dev-side gate checker mirroring the driver's correctness harness.

Usage: python3 dev/compare_gates.py <sfDir> <outDir> [query...]

Reads each <outDir>/<query> parquet (written by graft.tools.GateRunner),
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over
the <sfDir> tables, sorts columns by name and rows by all columns, and
compares values exactly (the driver hashes — exact equality here implies a
hash match there).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    """NaN compares equal to NaN and DECIMAL compares by value (the driver
    normalizes before hashing; raw tuple equality would false-alarm)."""
    import decimal
    import math

    def nv(v):
        if isinstance(v, decimal.Decimal):
            return float(v)
        if isinstance(v, float) and math.isnan(v):
            return "__nan__"
        return v
    return [tuple(nv(v) for v in r) for r in rows]


def dump_diff(out_dir, name, cols, ocols, s_rows, o_rows):
    """On any mismatch, write both sorted frames and a row-level diff to
    <out_dir>/<name>.diff.txt so the failure is diagnosable offline
    (round-10 lesson: q202's driver red cell was unreproducible with no
    row artifact to compare)."""
    path = f"{out_dir}/{name}.diff.txt"
    with open(path, "w") as f:
        f.write(f"spark cols : {cols}\noracle cols: {ocols}\n")
        f.write(f"spark rows : {len(s_rows)}\noracle rows: {len(o_rows)}\n")
        diffs = [(i, a, b) for i, (a, b)
                 in enumerate(zip(s_rows, o_rows)) if a != b]
        f.write(f"differing rows: {len(diffs)} "
                f"(+{abs(len(s_rows) - len(o_rows))} unpaired)\n\n")
        for i, a, b in diffs[:50]:
            f.write(f"row {i}:\n  spark : {a}\n  oracle: {b}\n")
        f.write("\n--- spark (sorted) ---\n")
        for r in s_rows:
            f.write("\t".join(map(repr, r)) + "\n")
        f.write("--- oracle (sorted) ---\n")
        for r in o_rows:
            f.write("\t".join(map(repr, r)) + "\n")
    print(f"     wrote {path}")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    names = sys.argv[3:] or sorted(oracle)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = 0
    for name in names:
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            # The external driver's pandas comparator crashes sorting
            # array/map/struct cells (round-9: q171) — refuse them here so
            # this mirror can never pass what the driver crashes on.
            nested = [f"{c} {t}" for c, t in
                      zip(spark_rel.columns, map(str, spark_rel.types))
                      if "[]" in str(t) or str(t).startswith(("STRUCT",
                                                              "MAP"))]
            if nested:
                print(f"FAIL {name}: non-scalar output column(s) "
                      f"{nested} — driver comparator cannot sort these")
                n_bad += 1
                continue
            cols = sorted(spark_rel.columns)
            collist = ", ".join(f'"{c}"' for c in cols)
            s_rows = norm(con.execute(
                f"SELECT {collist} FROM spark_rel ORDER BY ALL").fetchall())
            oracle_rel = con.sql(oracle[name])
            ocols = sorted(oracle_rel.columns)
            ocollist = ", ".join(f'"{c}"' for c in ocols)
            o_rows = norm(con.execute(
                f"SELECT {ocollist} FROM oracle_rel ORDER BY ALL").fetchall())
            # The external driver hashes pandas frames (fetchdf), so a
            # dtype-KIND drift with equal VALUES still red-flags there —
            # e.g. round-10/11's q202: an un-cast DuckDB HUGEINT
            # window-sum materializes as float64 while the engine writes
            # int64. fetchall() is blind to it (int == int). Compare the
            # numpy KIND of both sides' fetchdf dtypes: integer WIDTH is
            # hash-neutral (r11 driver passed q228 with engine int32 vs
            # oracle int64) but float-vs-int is not.
            s_dt = {c: (t.kind, str(t)) for c, t in con.execute(
                f"SELECT {collist} FROM spark_rel").fetchdf().dtypes.items()}
            o_dt = {c: (t.kind, str(t)) for c, t in con.execute(
                f"SELECT {ocollist} FROM oracle_rel").fetchdf().dtypes.items()}
            if cols == ocols and any(
                    s_dt[c][0] != o_dt[c][0] for c in cols):
                drift = {c: (s_dt[c][1], o_dt[c][1]) for c in cols
                         if s_dt[c][0] != o_dt[c][0]}
                print(f"FAIL {name}: pandas dtype drift "
                      f"{{col: (spark, oracle)}} = {drift} — the driver "
                      f"hashes fetchdf frames, so this mismatches there "
                      f"even when every value is equal")
                dump_diff(out_dir, name, cols, ocols, s_rows, o_rows)
                n_bad += 1
            elif cols != ocols:
                print(f"FAIL {name}: columns {cols} vs {ocols}")
                dump_diff(out_dir, name, cols, ocols, s_rows, o_rows)
                n_bad += 1
            elif len(s_rows) != len(o_rows):
                print(f"FAIL {name}: rows {len(s_rows)} vs {len(o_rows)}")
                dump_diff(out_dir, name, cols, ocols, s_rows, o_rows)
                n_bad += 1
            elif s_rows != o_rows:
                bad = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows))
                           if a != b)
                print(f"FAIL {name}: first diff at row {bad}:\n"
                      f"  spark : {s_rows[bad]}\n  oracle: {o_rows[bad]}")
                dump_diff(out_dir, name, cols, ocols, s_rows, o_rows)
                n_bad += 1
            else:
                print(f"ok   {name} ({len(s_rows)} rows)")
        except Exception as e:  # surface, never skip
            print(f"ERR  {name}: {e}")
            n_bad += 1
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
