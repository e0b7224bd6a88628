#!/usr/bin/env python3
"""DEV-ONLY harness mirroring the driver's DuckDB compare.

Runs each oracle SQL from a Verify output dir against the sf parquet tables
and compares with the Spark-side parquet dump: schema (column names), row
count, and an order-insensitive hash of values (columns sorted by name).
Not part of the library; the Scala code never depends on this.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, json, math, sys
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)


def row_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            orc = con.execute(sql)
            o_cols = [d[0] for d in orc.description]
            o_rows = orc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_bad += 1; continue
        sp = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
        s_cols = [d[0] for d in sp.description]
        s_rows = sp.fetchall()
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_bad += 1; continue
        if len(o_rows) != len(s_rows):
            print(f"FAIL {name}: rows oracle={len(o_rows)} spark={len(s_rows)}")
            n_bad += 1; continue
        om, sm = row_multiset(o_cols, o_rows), row_multiset(s_cols, s_rows)
        if om != sm:
            diff = [(a, b) for a, b in zip(om, sm) if a != b][:3]
            print(f"FAIL {name}: value mismatch ({len(o_rows)} rows); first diffs: {diff}")
            n_bad += 1; continue
        print(f"OK   {name}: {len(o_rows)} rows")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
