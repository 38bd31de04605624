#!/usr/bin/env python3
"""Merge per-shard check_json.py artifacts into ONE self-contained
board artifact (VERDICT r16 #2).

For every row stamped `err: oracle timeout...` whose query has an
exact Spark-side reference (graft.tools.DecadeGraphCheck — the
pair-graph consumer family), this wrapper invokes DecadeGraphCheck
once (one JVM, all such queries) via tools/run_main.sh and writes the
machine-readable verdict INTO the row:
    {"alt_oracle": "exact_spark_reference", "ok": true/false,
     "alt_check": "<check name>"}
so the artifact carries its own alternate-oracle evidence instead of
pointing at a separate tool run.

Usage: merge_board.py <out.json> <sfDir> <shard.json> [shard.json ...]
       [--no-run-alt]  (merge only; stamp from an existing
                        ALT_VERDICTS file if present)
Env: ALT_VERDICTS=<path> reuse/write the DecadeGraphCheck verdict
     file (default: <out.json>.alt)
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path


def main():
    argv = [a for a in sys.argv[1:] if a != "--no-run-alt"]
    run_alt = "--no-run-alt" not in sys.argv
    out_path, sf_dir, shards = argv[0], argv[1], argv[2:]
    merged = {}
    metas = []
    for s in shards:
        d = json.loads(Path(s).read_text())
        metas.append(d.pop("_meta", {}))
        merged.update(d)

    timeouts = sorted(
        k for k, v in merged.items()
        if v.get("err") and "oracle timeout" in v["err"])
    alt_path = Path(os.environ.get("ALT_VERDICTS", out_path + ".alt"))
    covered = {"d_ngram_pairs", "d_dup_groups", "d_cc_stars",
               "d_stream_dup_groups", "d_walk_counts", "d_cluster_rep"}
    need = [q for q in timeouts if q in covered]
    verdicts = {}
    if need and run_alt:
        here = Path(__file__).resolve().parent
        cmd = [str(here / "run_main.sh"), "graft.tools.DecadeGraphCheck",
               str(alt_path)] + need
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        print(f"[merge_board] invoking DecadeGraphCheck for {need}",
              flush=True)
        t0 = time.time()
        rc = subprocess.call(cmd, env=env)
        print(f"[merge_board] DecadeGraphCheck rc={rc} "
              f"({time.time() - t0:.0f}s)", flush=True)
    if alt_path.exists():
        verdicts = json.loads(alt_path.read_text())

    n_pass = n_fail = n_alt = 0
    still_failed = []
    for k in sorted(merged):
        v = merged[k]
        ok = v["rows_match"] and v["schema_match"] and v["hash_match"]
        if not ok and k in verdicts:
            v["alt_oracle"] = "exact_spark_reference"
            v["ok"] = bool(verdicts[k]["ok"])
            v["alt_check"] = verdicts[k]["check"]
            if v["ok"]:
                n_alt += 1
                continue
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            still_failed.append(k)
    merged["_meta"] = {
        "sf_dir": sf_dir,
        "n_queries": len(merged),
        "n_pass": n_pass,
        "n_alt_oracle_pass": n_alt,
        "n_fail": n_fail,
        "failed": still_failed,
        "shard_metas": metas,
        "note": ("self-contained board artifact: rows are check_json.py "
                 "DuckDB hash-compares; rows with alt_oracle="
                 "exact_spark_reference had a quadratic-at-this-SF DuckDB "
                 "oracle and carry the machine-readable verdict of "
                 "graft.tools.DecadeGraphCheck (exact grid-partitioned "
                 "pair join + driver union-find/adjacency/keeper "
                 "references) run by this wrapper on the same tree+SF"),
    }
    Path(out_path).write_text(json.dumps(merged, indent=1))
    print(f"== {n_pass} hash-pass, {n_alt} alt-oracle-pass, "
          f"{n_fail} fail -> {out_path} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
