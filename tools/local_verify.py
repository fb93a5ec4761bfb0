#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare each
SparkEntry query dump (written by `sbt "runMain graft.Verify <sfDir> <out>"`)
against its DuckDB oracle from oracle_sql.json.

A FULL run (no query filter) also writes CORRECTNESS_local.json next to
this script's repo root — the committed per-round proof the round-12
driver artifact failure showed the tree needs (the reference's analog:
expected/*.out ARE the committed proof in pg_regress). A filtered run is
an iteration aid, not evidence, and writes nothing.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [query ...]
"""
import json, os, sys, hashlib, time
import duckdb
import pyarrow.parquet as pq

def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    h = hashlib.sha256()
    for row in rows:
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            h.update(repr(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not oracle:
        print("FATAL EMPTY DUMP: oracle_sql.json is empty — nothing to compare")
        sys.exit(2)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        t0 = time.monotonic()  # re-pinned below; kept for the error path
        try:
            spark_tbl = pq.read_table(f"{out_dir}/{name}")
            # clock the ORACLE alone (not dump read / row hashing): this
            # timing exists to catch the next CTE-chain blowup
            t0 = time.monotonic()
            o = con.sql(sql)
            ocols, orows = o.columns, o.fetchall()
            sec = round(time.monotonic() - t0, 3)
            scols = spark_tbl.column_names
            srows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
            schema_ok = sorted(ocols) == sorted(scols)
            rows_ok = len(orows) == len(srows)
            hash_ok = schema_ok and table_hash(srows, scols) == table_hash(orows, ocols)
            ok = schema_ok and rows_ok and hash_ok
            if not ok:
                fails += 1
            results[name] = {"rows": len(srows), "oracle_rows": len(orows),
                             "schema": schema_ok, "hash": hash_ok, "ok": ok,
                             "oracle_sec": sec}
            print(f"{'PASS' if ok else 'FAIL'} {name}: rows {len(srows)}/{len(orows)}"
                  f" schema={schema_ok} hash={hash_ok} sec={sec}"
                  + ("" if schema_ok else f" spark={scols} oracle={ocols}"),
                  flush=True)
        except Exception as e:
            fails += 1
            sec = round(time.monotonic() - t0, 3)
            results[name] = {"err": str(e), "ok": False, "oracle_sec": sec}
            print(f"ERR  {name}: {e} sec={sec}", flush=True)
    if not results:
        print("FATAL EMPTY DUMP: zero queries compared")
        sys.exit(2)
    if not only:
        n_ok = sum(1 for r in results.values() if r["ok"])
        summary = {"sf_dir": sf_dir, "total": len(results), "pass": n_ok,
                   "fail": len(results) - n_ok, "queries": results}
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "CORRECTNESS_local.json"), "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote CORRECTNESS_local.json: {n_ok}/{len(results)} pass")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
