#!/usr/bin/env python3
"""Self-test for compare_gates.py's failure detectors — run it any time
the mirror changes: `python3 dev/selftest_compare_gates.py`.

Builds tiny synthetic gate dumps + oracles and asserts the mirror
FLAGS each class of driver-visible failure:
  1. dtype-KIND drift at equal values (the q202 class: an un-cast DuckDB
     HUGEINT window-sum materializes as float64 through fetchdf while
     the engine writes int64 — fetchall() is blind to it);
  2. value mismatch;
  3. row-count mismatch;
and PASSES an exact match plus an int-width-only difference (int32 vs
int64 — hash-neutral at the driver, r11 q228 evidence).
"""
import json
import os
import subprocess
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
MIRROR = os.path.join(HERE, "compare_gates.py")


def run_case(name, spark_sql, oracle_sql, expect_fail, expect_text=None):
    sf = tempfile.mkdtemp(prefix="cgst_sf")
    out = tempfile.mkdtemp(prefix="cgst_out")
    con = duckdb.connect()
    # minimal fixture tables (the mirror creates views over all of them)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"COPY (SELECT 1::BIGINT AS doc_id) TO "
                    f"'{sf}/{t}.parquet' (FORMAT PARQUET)")
    os.makedirs(f"{out}/{name}")
    con.execute(f"COPY ({spark_sql}) TO '{out}/{name}/part.parquet' "
                f"(FORMAT PARQUET)")
    with open(f"{out}/oracle_sql.json", "w") as f:
        json.dump({name: oracle_sql}, f)
    r = subprocess.run([sys.executable, MIRROR, sf, out, name],
                       capture_output=True, text=True)
    failed = r.returncode != 0
    ok = failed == expect_fail and (
        expect_text is None or expect_text in r.stdout)
    status = "ok  " if ok else "BAD "
    print(f"{status} {name}: rc={r.returncode} "
          f"(expected {'fail' if expect_fail else 'pass'})")
    if not ok:
        print(r.stdout)
        sys.exit(1)


def main():
    # 1. the q202 class: equal VALUES, engine int64 vs oracle float64
    run_case("dtype_kind_drift",
             "SELECT 1::BIGINT AS a, 302::BIGINT AS b",
             "SELECT 1::BIGINT AS a, 302::DOUBLE AS b",
             expect_fail=True, expect_text="dtype drift")
    # 2. un-cast HUGEINT window-sum reproduces the same drift
    run_case("hugeint_window_sum",
             "SELECT 1::BIGINT AS doc_id, 7::BIGINT AS s",
             "SELECT doc_id, sum(7::BIGINT) OVER () AS s FROM documents",
             expect_fail=True, expect_text="dtype drift")
    # 3. int WIDTH alone must pass (driver hash is width-neutral)
    run_case("int_width_only",
             "SELECT 1::INT AS a",
             "SELECT 1::BIGINT AS a",
             expect_fail=False)
    # 4. exact match passes
    run_case("exact",
             "SELECT 1::BIGINT AS a, 'x' AS t",
             "SELECT 1::BIGINT AS a, 'x' AS t",
             expect_fail=False)
    # 5. value mismatch fails
    run_case("value_diff",
             "SELECT 1::BIGINT AS a",
             "SELECT 2::BIGINT AS a",
             expect_fail=True)
    # 6. row-count mismatch fails
    run_case("row_diff",
             "SELECT 1::BIGINT AS a",
             "SELECT 1::BIGINT AS a UNION ALL SELECT 2::BIGINT",
             expect_fail=True)
    print("all mirror self-tests passed")


if __name__ == "__main__":
    main()
