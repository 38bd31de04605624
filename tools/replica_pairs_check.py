#!/usr/bin/env python3
"""Exact pair-family oracle for an SfGen-replicated corpus.

An SfGen corpus is N key-shifted copies of a base corpus whose pair
output is already DuckDB-oracle-verified (tools/check.py at the gate SF,
tools/scale_pairs_check.py at sf0.1). Replication makes the TRUE pair
set at the large scale derivable exactly — no sampling:

  - copy twins: every base doc a with a non-degenerate gram set gains
    C(N,2) cross-copy pairs (a+i*off, a+j*off), similarity = identical
    sets (jaccard 1.0 / hamming 0);
  - lifted pairs: every verified base pair (a, b, sim) lifts to N*N
    pairs (a+i*off, b+j*off, sim) — the texts are byte-identical to the
    base docs', so the similarity doubles carry over bit-for-bit.

The script derives that expected set from the BASE Verify dump and the
base corpus, and requires the large-scale Spark dump to equal it
exactly. d_dup_groups gets the same full union-find replay as
tools/scale_pairs_check.py.

Usage:
  python3 tools/replica_pairs_check.py <baseSfDir> <baseVerifyDir> \
      <bigVerifyDir> <copies>
"""
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq


def spark_rows(outdir, name, cols):
    t = pq.read_table(str(Path(outdir) / name))
    d = {c: t.column(c).to_pylist() for c in cols}
    return sorted(zip(*(d[c] for c in cols)))


def check(name, got, want):
    ok = got == want
    print(f"{'PASS' if ok else 'FAIL'} {name} "
          f"(rows: spark={len(got)} derived-oracle={len(want)})")
    if not ok:
        ws, gs = set(want), set(got)
        extra = [r for r in got if r not in ws][:3]
        miss = [r for r in want if r not in gs][:3]
        if extra:
            print(f"  spark-only: {extra}")
        if miss:
            print(f"  oracle-only: {miss}")
    return ok


def lift(base_pairs, eligible, off, n):
    """Expected large-scale pair set: copy twins + lifted base pairs.
    `eligible` is [(id, self_similarity)] for the twin pairs."""
    want = []
    for a, self_sim in eligible:
        for i in range(n):
            for j in range(i + 1, n):
                want.append((a + i * off, a + j * off, self_sim))
    for a, b, sim in base_pairs:
        for i in range(n):
            for j in range(n):
                x, y = a + i * off, b + j * off
                want.append((min(x, y), max(x, y), sim))
    return sorted(want)


def main():
    base_sf, base_out, big_out, copies = (
        sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]))
    con = duckdb.connect()
    off = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{base_sf}/documents.parquet'"
    ).fetchone()[0]
    voff = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{base_sf}/embeddings.parquet'"
    ).fetchone()[0]
    ok = True

    # eligibility: a doc forms twin pairs iff its gram set is non-empty
    # (empty sets give 0/0 jaccard -> excluded on both scales)
    tok_ok = [r[0] for r in con.execute(f"""
      SELECT doc_id FROM (
        SELECT doc_id, len(list_distinct(list_transform(
          range(1, greatest(len(t) - 1, 1)),
          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS ns
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM '{base_sf}/documents.parquet') x)
      WHERE ns > 0 ORDER BY doc_id""").fetchall()]
    gram_ok = [r[0] for r in con.execute(f"""
      SELECT doc_id FROM (
        SELECT doc_id, len(list_distinct(list_transform(
          range(1, greatest(length(text) - 14, 1)),
          i -> substring(text, i, 16)))) AS ns
        FROM '{base_sf}/documents.parquet')
      WHERE ns > 0 ORDER BY doc_id""").fetchall()]
    all_docs = [r[0] for r in con.execute(
        f"SELECT doc_id FROM '{base_sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()]
    # per-vector self-cosine exactly as both engines compute it:
    # d = sequential-fold dot(a,a); cos = d / (sqrt(d) * sqrt(d)) —
    # NOT 1.0 in floating point, and different per vector. Python floats
    # are IEEE doubles with the same left-to-right fold, so the bits
    # match Spark's dot_product and DuckDB's list_sum.
    import math
    vec_self = []
    for vid, emb in con.execute(
            f"SELECT vec_id, embedding::DOUBLE[] FROM "
            f"'{base_sf}/embeddings.parquet' ORDER BY vec_id").fetchall():
        d = 0.0
        for x in emb:
            d += x * x
        if d > 0:
            s = math.sqrt(d)
            c = d / (s * s)
            if c >= 0.4:
                vec_self.append((vid, c))

    for name, cols, eligible, o in [
        ("d_minhash_pairs", ["doc_a", "doc_b", "jaccard"],
         [(a, 1.0) for a in tok_ok], off),
        ("d_prefix_pairs", ["doc_a", "doc_b", "jaccard"],
         [(a, 1.0) for a in tok_ok], off),
        ("d_ngram_pairs", ["doc_a", "doc_b", "jaccard"],
         [(a, 1.0) for a in gram_ok], off),
        ("d_simhash_pairs", ["doc_a", "doc_b", "hamming"],
         [(a, 0) for a in all_docs], off),
        ("s_cosine_pairs", ["vec_a", "vec_b", "cosine"], vec_self, voff),
    ]:
        base = spark_rows(base_out, name, cols)
        big = spark_rows(big_out, name, cols)
        want = lift(base, eligible, o, copies)
        ok &= check(f"{name} (derived from base)", big, want)

    # d_dup_groups: full union-find replay over Spark's own big edges
    mh = spark_rows(big_out, "d_minhash_pairs", ["doc_a", "doc_b", "jaccard"])
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in mh:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    want_groups = sorted((v, find(v)) for v in parent)
    got_groups = spark_rows(big_out, "d_dup_groups", ["doc_id", "group_id"])
    ok &= check("d_dup_groups (full union-find replay)",
                got_groups, want_groups)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
