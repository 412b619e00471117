#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs each oracle in DuckDB over the sf tables, and
compares rows / schema / values (columns sorted by name, rows sorted by
all values) — the same shape of check the driver applies.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = out_dir / name
        row = {"rows_match": False, "schema_match": False, "hash_match": False, "err": None}
        try:
            if (out_dir / f"{name}._err").exists():
                raise RuntimeError("spark side failed: " + (out_dir / f"{name}._err").read_text()[:200])
            spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            spark_cols = sorted(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
            ora_rel = con.sql(sql)
            ora_cols = sorted(zip(ora_rel.columns, [str(t) for t in ora_rel.types]))
            s_names = [c for c, _ in spark_cols]
            o_names = [c for c, _ in ora_cols]
            sv = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()[s_names]
            ov = con.sql(sql).df()[o_names]
            row["spark_rows"], row["oracle_rows"] = len(sv), len(ov)
            row["rows_match"] = len(sv) == len(ov)
            row["schema_match"] = spark_cols == ora_cols
            if not row["schema_match"]:
                row["schema_diff"] = {"spark": spark_cols, "oracle": ora_cols}
            s_sorted = sorted(map(tuple, sv.itertuples(index=False)))
            o_sorted = sorted(map(tuple, ov.itertuples(index=False)))
            row["hash_match"] = s_sorted == o_sorted
            if row["rows_match"] and not row["hash_match"]:
                for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
                    if a != b:
                        row["first_diff"] = {"i": i, "spark": [str(x) for x in a], "oracle": [str(x) for x in b]}
                        break
        except Exception as e:
            row["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = row
    print(json.dumps(results, indent=1, default=str))
    ok = sum(1 for r in results.values() if r["rows_match"] and r["schema_match"] and r["hash_match"])
    print(f"\n== {ok}/{len(results)} green ==", file=sys.stderr)


if __name__ == "__main__":
    main()
