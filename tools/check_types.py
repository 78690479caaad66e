#!/usr/bin/env python3
"""Column-TYPE drift audit between Spark dumps and DuckDB oracle results.

The driver's comparator hashes values after sorting columns by name; a
representation drift (DOUBLE vs BIGINT, HUGEINT coerced to float by
pandas/arrow) can fail queries whose VALUES match. check_correctness.py
tolerates it (float-aware compare) — this script makes the drift visible
so oracles can be cast to the exact dump types.

Usage: python3 tools/check_types.py <sfDir> <outDir>
Exit code = number of drifting columns.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import glob

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# duckdb type -> acceptable arrow (spark dump) type prefix
MAP = {"BIGINT": "int64", "DOUBLE": "double", "VARCHAR": "string",
       "INTEGER": "int32", "DATE": "date32", "TIMESTAMP": "timestamp",
       "FLOAT": "float", "BOOLEAN": "bool"}


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    drift = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            continue
        spark_types = {f.name: str(f.type)
                       for f in pq.ParquetFile(files[0]).schema_arrow}
        try:
            rel = con.sql(sql)
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            drift += 1
            continue
        for c, dt in zip(rel.columns, [str(t) for t in rel.types]):
            st = spark_types.get(c)
            if st is None:
                print(f"{name}: column {c} missing in spark dump")
                drift += 1
                continue
            expected = MAP.get(dt.split("(")[0])
            if expected is None:
                # HUGEINT and friends: no stable arrow mapping — flag it
                print(f"{name}: {c}: duck={dt} (unmapped) spark={st}")
                drift += 1
            elif not st.startswith(expected):
                print(f"{name}: {c}: duck={dt} spark={st}")
                drift += 1
    print(f"[check_types] {drift} drifting columns")
    return drift


if __name__ == "__main__":
    sys.exit(min(main(sys.argv[1], sys.argv[2]), 125))
