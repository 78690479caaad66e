#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>

Reads each <outDir>/<name> parquet dump produced by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the same parquet
tables, sorts columns by name and rows by all columns, and compares with a
float tolerance. Exit code = number of mismatching queries.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((x is None, str(x)) for x in t)
    out.sort(key=key)
    return [cols[i] for i in order], out


def val_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


# The 5-char-shingle co-occurrence pair set is re-derived VERBATIM by ~10
# oracles (ngram-jaccard family, components, curation, splits, keeper,
# neighbor top-k) and dominates the sf0.1 suite (~55-75 s PER oracle).
# When 2+ oracles carry the exact blocks below, materialize the shared
# derivation ONCE per checker session as temp tables and rewrite the
# oracles to read them — one derivation, ten readers. Replacements are
# exact-text (the generator lives in this repo beside this checker); an
# oracle that drifts simply runs unrewritten, trading speed, not
# correctness.
SHARED_SH = ("sh AS MATERIALIZED (SELECT doc_id, list_distinct([substr("
             "text, i::INT, 5) FOR i IN range(1, greatest(length(text) - "
             "4, 1) + 1)]) AS s FROM documents)")
SHARED_SHN = "shn AS MATERIALIZED (SELECT doc_id, len(s) AS n FROM sh)"
SHARED_CO = """co AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS inter
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2)"""


def rewrite_shared(con, oracles):
    import time
    users = [n for n, s in oracles.items() if SHARED_CO in s]
    if len(users) < 2:
        return oracles
    t0 = time.time()
    con.execute("CREATE TEMP TABLE _g_sh AS "
                + SHARED_SH.split("(", 1)[1].rsplit(")", 1)[0])
    con.execute("CREATE TEMP TABLE _g_shn AS SELECT doc_id, len(s) AS n "
                "FROM _g_sh")
    con.execute("CREATE TEMP TABLE _g_co AS WITH tok AS (SELECT doc_id, "
                "unnest(s) AS t FROM _g_sh)\n"
                + SHARED_CO.split("(", 1)[1].rsplit(")", 1)[0])
    print(f"[shared] token-join pair set materialized once in "
          f"{time.time() - t0:.1f}s for {len(users)} oracles")
    out = {}
    for n, s in oracles.items():
        s = s.replace(SHARED_SH, "sh AS (SELECT * FROM _g_sh)")
        s = s.replace(SHARED_SHN, "shn AS (SELECT * FROM _g_shn)")
        s = s.replace(SHARED_CO, "co AS (SELECT * FROM _g_co)")
        out[n] = s
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    oracles = rewrite_shared(con, oracles)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols, got = canon(got_rel.fetchall(), got_rel.columns)
            exp_rel = con.sql(sql)
            exp_cols, exp = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {e}")
            failures += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got, exp)):
            if not all(val_eq(x, y) for x, y in zip(g, e)):
                bad = (i, g, e)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  got {bad[1]}\n  exp {bad[2]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    return failures


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: check_correctness.py <sfDir> <outDir>  "
                 "(sfDir = testdata tables, outDir = graft.Verify dump)")
    if not os.path.exists(f"{sys.argv[2]}/oracle_sql.json"):
        sys.exit(f"no oracle_sql.json under outDir '{sys.argv[2]}' — "
                 "args are (sfDir, outDir) in that order; did you swap them?")
    sys.exit(main(sys.argv[1], sys.argv[2]))
