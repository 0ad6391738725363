#!/usr/bin/env python3
"""Local DuckDB cross-check mirroring the driver's compare: for each query
result parquet dumped by graft.Verify, run the matching oracle SQL from
oracle_sql.json against the same sf tables, sort columns by name, and
compare row count / schema / a value hash. Dev tool only (python+duckdb are
driver-side; this script is not part of the library).

Usage: scripts/oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import hashlib
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    want = set(sys.argv[3:])
    sql_map = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = 0
    names = [n for n in sorted(sql_map) if not want or n in want]
    for name in names:
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            if want:
                print(f"{name}: NO SPARK DUMP")
                bad += 1
            continue
        tbl = pq.read_table(res_dir)
        s_cols = sorted(tbl.column_names)
        s_rows = [tuple(r[c] for c in tbl.column_names)
                  for r in tbl.to_pylist()]
        try:
            cur = con.execute(sql_map[name])
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            bad += 1
            continue
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = s_cols == sorted(o_cols)
        hash_ok = (table_hash(s_rows, list(tbl.column_names))
                   == table_hash(o_rows, o_cols))
        ok = rows_ok and schema_ok and hash_ok
        bad += 0 if ok else 1
        print(f"{name}: rows={len(s_rows)}/{len(o_rows)} "
              f"schema={'ok' if schema_ok else s_cols + o_cols} "
              f"hash={'ok' if hash_ok else 'MISMATCH'}"
              + ("" if ok else "  <-- BAD"))
    print(f"BAD: {bad} of {len(names)}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
