#!/usr/bin/env python3
"""Driver-gate-shaped correctness replay with a JSON artifact
(VERDICT r15 #1: the full 225-query board one decade up).

Usage: python3 tools/check_json.py <sfDir> <verifyOutDir> <out.json> \
           [shard] [nshards]

Same comparison as tools/check.py (columns sorted by name, rows
sorted, values exact — floats bit-for-bit after Decimal->float and
datetime->str normalization), but emits one JSON object per query in
the driver's CORRECTNESS_r*.json shape:
  {"rows_match", "schema_match", "hash_match", "spark_rows",
   "oracle_rows", "err", "wall_sec"}
plus a "_meta" entry stamping the run (sf dir, wall clock, totals).
Queries whose oracle cannot run at this SF get an honest err stamp
instead of a silent skip.

An oracle that exceeds CHECK_ORACLE_TIMEOUT_SEC (default 900) is
interrupted (duckdb con.interrupt()) and stamped as a timeout — the
one-decade-up replay must not wedge on a quadratic oracle that the
sf0.01 gate already passes. shard/nshards split the sorted query list
round-robin so several workers run in parallel (merge the per-shard
JSONs afterwards).
"""
import json
import math
import os
import sys
import threading
import time
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def comparable(v):
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t))
    return [colnames[i] for i in order], out


def main():
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    shard = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    nshards = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    timeout = float(os.environ.get("CHECK_ORACLE_TIMEOUT_SEC", "900"))

    def connect():
        c = duckdb.connect()
        c.execute(f"SET threads={int(os.environ.get('CHECK_THREADS', '6'))}")
        for t in TABLES:
            p = Path(sf_dir) / f"{t}.parquet"
            if p.exists():
                c.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    con = connect()
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    result = {}
    t_run0 = time.time()
    n_pass = n_fail = 0
    # optional argv[6:] = explicit query-name subset (the retry-pass
    # path: re-run only the timed-out oracles with a bigger budget,
    # then hand the retry artifact to merge_board.py LAST so its rows
    # win the merge)
    subset = set(sys.argv[6:])
    if subset:
        oracle = {k: v for k, v in oracle.items() if k in subset}
    items = [kv for i, kv in enumerate(sorted(oracle.items()))
             if i % nshards == shard]
    for name, sql in items:
        t0 = time.time()
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        try:
            res_dir = Path(out_dir) / name
            if not res_dir.exists():
                raise RuntimeError("no spark output")
            files = list(res_dir.glob("*.parquet"))
            tbl = (pq.read_table(files[0]) if len(files) == 1
                   else pq.read_table(res_dir))
            spark_cols = tbl.column_names
            spark_rows = [tuple(r.values()) for r in tbl.to_pylist()]
            entry["spark_rows"] = len(spark_rows)
            # watchdog: interrupt a runaway oracle instead of wedging
            # the whole board on it. `fired` closes the ADVICE r16
            # race: the timer can fire after the query completes but
            # before timer.cancel(), leaving an interrupt pending on
            # the shared connection that would kill the NEXT query —
            # whenever the timer fired at all, the connection is
            # suspect and gets rebuilt.
            fired = threading.Event()

            def watchdog():
                fired.set()
                con.interrupt()

            timer = threading.Timer(timeout, watchdog)
            timer.start()
            try:
                cur = con.execute(sql)
                duck_cols = [d[0] for d in cur.description]
                duck_rows = cur.fetchall()
            except duckdb.InterruptException:
                raise RuntimeError(
                    f"oracle timeout: interrupted after {timeout:.0f}s "
                    f"(sf0.01 gate passes; oracle not tractable here)")
            finally:
                timer.cancel()
                if fired.is_set():
                    try:
                        con.close()
                    except Exception:
                        pass
                    con = connect()
            entry["oracle_rows"] = len(duck_rows)
            sc, sr = canon(spark_rows, spark_cols)
            dc, dr = canon(duck_rows, duck_cols)
            entry["schema_match"] = sc == dc
            entry["rows_match"] = len(sr) == len(dr)
            if entry["schema_match"] and entry["rows_match"]:
                entry["hash_match"] = all(
                    tuple(comparable(x) for x in a)
                    == tuple(comparable(x) for x in b)
                    for a, b in zip(sr, dr))
            if not entry["schema_match"]:
                entry["err"] = f"columns differ spark={sc} duck={dc}"
            elif not entry["rows_match"]:
                entry["err"] = (f"row count spark={len(sr)}"
                                f" duck={len(dr)}")
            elif not entry["hash_match"]:
                bad = next((i, a, b) for i, (a, b) in enumerate(zip(sr, dr))
                           if tuple(comparable(x) for x in a)
                           != tuple(comparable(x) for x in b))
                entry["err"] = (f"row {bad[0]} differs spark={bad[1]!r}"
                                f" duck={bad[2]!r}"[:500])
        except Exception as e:
            entry["err"] = f"{type(e).__name__}: {e}"[:500]
        entry["wall_sec"] = round(time.time() - t0, 2)
        ok = (entry["rows_match"] and entry["schema_match"]
              and entry["hash_match"])
        n_pass += ok
        n_fail += not ok
        print(("PASS" if ok else "FAIL"),
              name, entry["wall_sec"], "s",
              "" if ok else entry["err"], flush=True)
        result[name] = entry
    result["_meta"] = {
        "sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
        "total_wall_sec": round(time.time() - t_run0, 1)}
    Path(artifact).write_text(json.dumps(result, indent=1))
    print(f"== {n_pass} pass, {n_fail} fail -> {artifact} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
