#!/usr/bin/env python3
"""Sampled >gate-scale oracle evidence for the quadratic-oracle pair
family (VERDICT r6 #2).

The exact DuckDB oracles for d_minhash_pairs / d_ngram_pairs /
d_simhash_pairs / s_cosine_pairs / d_containment_pairs / d_dup_groups
are O(n^2), so the driver's gate runs them at sf0.01 only. This script
verifies the same queries at a LARGER sf on a stratified sample: pick S
docs (uniform strata over the id range, UNIONed with every participant
of the Spark pair output so the positive pairs are actually exercised),
compute each sampled doc's TRUE pair set with a targeted O(S*n) probe
(one side of the pair join restricted to the sample), and require the
Spark output restricted to the sample to match exactly — bit-for-bit
doubles, the same comparison discipline as tools/check.py.

d_dup_groups gets a FULL check, not a sampled one: its edge relation is
definitionally d_minhash_pairs (same table, same shingles, same 0.8
threshold), so with the sampled evidence for the edges, a plain
union-find replay over Spark's own full edge list must reproduce
Spark's component labels for every vertex.

Each family's section runs only if its dump directory is present, so
the script works on both full and targeted Verify dumps.

Usage: python3 tools/scale_pairs_check.py <sfDir> <verifyOutDir> [S]
"""
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

STRATA = 25  # uniform sample size (pair participants are added on top)


def spark_rows(outdir, name, cols):
    t = pq.read_table(str(Path(outdir) / name))
    d = {c: t.column(c).to_pylist() for c in cols}
    return sorted(zip(*(d[c] for c in cols)))


def sample_ids(con, sfdir, table, idcol, participants, s=STRATA):
    ids = [r[0] for r in con.execute(
        f"SELECT {idcol} FROM '{sfdir}/{table}.parquet' ORDER BY {idcol}"
    ).fetchall()]
    step = max(1, len(ids) // s)
    strata = set(ids[::step][:s])
    # cap participant ids deterministically (every 3rd by sorted order)
    extra = sorted(participants)[::3][:2 * s]
    return sorted(strata | set(extra))


def restrict(rows, sample):
    ss = set(sample)
    return [r for r in rows if r[0] in ss or r[1] in ss]


def check(name, got, want):
    ok = got == want
    print(f"{'PASS' if ok else 'FAIL'} {name} "
          f"(sampled rows: spark={len(got)} oracle={len(want)})")
    if not ok:
        extra = [r for r in got if r not in want][:3]
        miss = [r for r in want if r not in got][:3]
        if extra:
            print(f"  spark-only: {extra}")
        if miss:
            print(f"  oracle-only: {miss}")
    return ok


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    s = int(sys.argv[3]) if len(sys.argv) > 3 else STRATA
    con = duckdb.connect()
    ok = True

    def have(name):
        return (Path(outdir) / name).exists()

    # ---- token-shingle jaccard (d_minhash_pairs) ----
    mh = None
    if have("d_minhash_pairs"):
        mh = spark_rows(outdir, "d_minhash_pairs",
                        ["doc_a", "doc_b", "jaccard"])
        parts = {r[0] for r in mh} | {r[1] for r in mh}
        samp = sample_ids(con, sfdir, "documents", "doc_id", parts, s)
        sl = ",".join(map(str, samp))
        q = f"""
        WITH sh AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(len(t) - 1, 1)),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ss
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                FROM '{sfdir}/documents.parquet') x),
        sm AS (SELECT * FROM sh WHERE doc_id IN ({sl})),
        p AS (
          SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
            GREATEST(a.doc_id, b.doc_id) AS doc_b,
            CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.ss, b.ss))) AS DOUBLE) AS j
          FROM sm a JOIN sh b ON a.doc_id <> b.doc_id)
        SELECT DISTINCT doc_a, doc_b,
          CAST(len(list_intersect(a2.ss, b2.ss)) AS DOUBLE) /
            CAST(len(list_distinct(list_concat(a2.ss, b2.ss))) AS DOUBLE)
              AS jaccard
        FROM p JOIN sh a2 ON a2.doc_id = doc_a
          JOIN sh b2 ON b2.doc_id = doc_b
        WHERE j >= 0.8 ORDER BY doc_a, doc_b"""
        want = sorted(tuple(r) for r in con.execute(q).fetchall())
        ok &= check("d_minhash_pairs@" + sfdir, restrict(mh, samp), want)

    # ---- char-16-gram jaccard (d_ngram_pairs) ----
    if have("d_ngram_pairs"):
        ng = spark_rows(outdir, "d_ngram_pairs",
                        ["doc_a", "doc_b", "jaccard"])
        parts = {r[0] for r in ng} | {r[1] for r in ng}
        samp = sample_ids(con, sfdir, "documents", "doc_id", parts, s)
        sl = ",".join(map(str, samp))
        q = f"""
        WITH cg AS (
          SELECT doc_id, list_distinct(list_transform(
            range(1, greatest(length(text) - 14, 1)),
            i -> substring(text, i, 16))) AS gs
          FROM '{sfdir}/documents.parquet'),
        sm AS (SELECT * FROM cg WHERE doc_id IN ({sl})),
        p AS (
          SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
            GREATEST(a.doc_id, b.doc_id) AS doc_b,
            CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) /
              CAST(len(list_distinct(list_concat(a.gs, b.gs))) AS DOUBLE) AS j
          FROM sm a JOIN cg b ON a.doc_id <> b.doc_id)
        SELECT DISTINCT doc_a, doc_b,
          CAST(len(list_intersect(a2.gs, b2.gs)) AS DOUBLE) /
            CAST(len(list_distinct(list_concat(a2.gs, b2.gs))) AS DOUBLE)
              AS jaccard
        FROM p JOIN cg a2 ON a2.doc_id = doc_a
          JOIN cg b2 ON b2.doc_id = doc_b
        WHERE j >= 0.8 ORDER BY doc_a, doc_b"""
        want = sorted(tuple(r) for r in con.execute(q).fetchall())
        ok &= check("d_ngram_pairs@" + sfdir, restrict(ng, samp), want)

    # ---- simhash hamming<=3 (d_simhash_pairs) ----
    if have("d_simhash_pairs"):
        sp = spark_rows(outdir, "d_simhash_pairs",
                        ["doc_a", "doc_b", "hamming"])
        parts = {r[0] for r in sp} | {r[1] for r in sp}
        samp = sample_ids(con, sfdir, "documents", "doc_id", parts, s)
        sl = ",".join(map(str, samp))
        q = f"""
        WITH t AS (SELECT doc_id,
            list_distinct(string_split_regex(trim(text), '\\s+')) AS dt
          FROM '{sfdir}/documents.parquet'),
        tok AS (SELECT doc_id, unnest(dt) AS tok FROM t),
        bits AS (SELECT doc_id, tok, b,
            instr('0123456789abcdef',
                  substring(md5(tok), (b // 4) + 1, 1)) - 1 AS nib
          FROM tok CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bs),
        bv AS (SELECT doc_id, b,
            SUM(2 * (CASE b % 4 WHEN 0 THEN nib // 8
                     WHEN 1 THEN (nib // 4) % 2
                     WHEN 2 THEN (nib // 2) % 2 ELSE nib % 2 END) - 1) AS s
          FROM bits GROUP BY doc_id, b),
        sh AS (SELECT doc_id,
          CAST(SUM(CASE WHEN s >= 0 AND b < 32 THEN CAST(pow(2, b) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS sim_lo,
          CAST(SUM(CASE WHEN s >= 0 AND b >= 32
                   THEN CAST(pow(2, b - 32) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS sim_hi
          FROM bv GROUP BY doc_id),
        sm AS (SELECT * FROM sh WHERE doc_id IN ({sl}))
        SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
          GREATEST(a.doc_id, b.doc_id) AS doc_b,
          CAST(bit_count(xor(a.sim_lo, b.sim_lo)) +
               bit_count(xor(a.sim_hi, b.sim_hi)) AS BIGINT) AS hamming
        FROM sm a JOIN sh b ON a.doc_id <> b.doc_id
        WHERE bit_count(xor(a.sim_lo, b.sim_lo)) +
              bit_count(xor(a.sim_hi, b.sim_hi)) <= 3
        ORDER BY doc_a, doc_b"""
        want = sorted(tuple(r) for r in con.execute(q).fetchall())
        ok &= check("d_simhash_pairs@" + sfdir, restrict(sp, samp), want)

    # ---- embedding cosine>=0.4 (s_cosine_pairs) ----
    if have("s_cosine_pairs"):
        cp = spark_rows(outdir, "s_cosine_pairs",
                        ["vec_a", "vec_b", "cosine"])
        parts = {r[0] for r in cp} | {r[1] for r in cp}
        samp = sample_ids(con, sfdir, "embeddings", "vec_id", parts, s)
        sl = ",".join(map(str, samp))
        q = f"""
        WITH n AS (SELECT vec_id, emb,
            sqrt(list_sum(list_transform(list_zip(emb, emb),
                 x -> x[1] * x[2]))) AS nrm
          FROM (SELECT vec_id, embedding::DOUBLE[] AS emb
                FROM '{sfdir}/embeddings.parquet') e),
        sm AS (SELECT * FROM n WHERE vec_id IN ({sl}))
        SELECT DISTINCT LEAST(a.vec_id, b.vec_id) AS vec_a,
          GREATEST(a.vec_id, b.vec_id) AS vec_b,
          CASE WHEN a.vec_id < b.vec_id THEN
            list_sum(list_transform(list_zip(a.emb, b.emb),
                x -> x[1] * x[2])) / (a.nrm * b.nrm)
          ELSE
            list_sum(list_transform(list_zip(b.emb, a.emb),
                x -> x[1] * x[2])) / (b.nrm * a.nrm)
          END AS cosine
        FROM sm a JOIN n b ON a.vec_id <> b.vec_id
        WHERE CASE WHEN a.vec_id < b.vec_id THEN
            list_sum(list_transform(list_zip(a.emb, b.emb),
                x -> x[1] * x[2])) / (a.nrm * b.nrm)
          ELSE
            list_sum(list_transform(list_zip(b.emb, a.emb),
                x -> x[1] * x[2])) / (b.nrm * a.nrm) END >= 0.4
        ORDER BY vec_a, vec_b"""
        want = sorted(tuple(r) for r in con.execute(q).fetchall())
        ok &= check("s_cosine_pairs@" + sfdir, restrict(cp, samp), want)

    # ---- directed containment>=0.8 over the spans corpus ----
    if have("d_containment_pairs"):
        ct = spark_rows(outdir, "d_containment_pairs",
                        ["host_id", "piece_id", "containment"])
        parts = {r[0] for r in ct} | {r[1] for r in ct}
        samp = sample_ids(con, sfdir, "documents", "doc_id", parts, s)
        sl = ",".join(map(str, samp))
        q = f"""
        WITH base AS (SELECT doc_id, trim(text) AS text
                 FROM '{sfdir}/documents.parquet'),
        tok AS (SELECT doc_id, text,
            string_split_regex(text, '\\s+') AS t FROM base),
        mx AS (SELECT max(doc_id) AS m FROM base),
        remix AS (SELECT doc_id + CAST(power(10,
              length(CAST((SELECT m FROM mx) AS VARCHAR))) AS BIGINT)
                AS doc_id,
            array_to_string(list_slice(t, 1, 12), ' ') || ' xq' ||
              CAST(doc_id AS VARCHAR) || 'xq ' ||
              array_to_string(list_slice(t, len(t) - 11, len(t)), ' ')
                AS text
          FROM tok WHERE doc_id % 5 = 0 AND len(t) >= 30),
        corpus AS (SELECT doc_id, text FROM base
          UNION ALL SELECT doc_id, text FROM remix),
        m AS (SELECT doc_id,
            string_split_regex(trim(text), '\\s+') AS t FROM corpus),
        sh AS (SELECT doc_id, list_distinct(list_transform(
            range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ss
          FROM m WHERE len(t) >= 3),
        sm AS (SELECT * FROM sh WHERE doc_id IN ({sl})),
        probes AS (
          SELECT a.doc_id AS host_id, b.doc_id AS piece_id,
            CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
              / CAST(len(b.ss) AS DOUBLE) AS containment
          FROM sm a JOIN sh b ON a.doc_id <> b.doc_id
          UNION ALL
          SELECT a.doc_id, b.doc_id,
            CAST(len(list_intersect(a.ss, b.ss)) AS DOUBLE)
              / CAST(len(b.ss) AS DOUBLE)
          FROM sh a JOIN sm b ON a.doc_id <> b.doc_id)
        SELECT DISTINCT host_id, piece_id, containment FROM probes
        WHERE containment >= 0.8 ORDER BY host_id, piece_id"""
        want = sorted(tuple(r) for r in con.execute(q).fetchall())
        ok &= check("d_containment_pairs@" + sfdir, restrict(ct, samp), want)

    # ---- d_dup_groups: FULL union-find replay over Spark's edges ----
    if have("d_dup_groups") and mh is None:
        # never report silent success for a check that could not run
        print("SKIP d_dup_groups (needs the d_minhash_pairs dump "
              "for its edge relation)")
    if mh is not None and have("d_dup_groups"):
        edges = [(a, b) for a, b, _ in mh]
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        want_groups = sorted((v, find(v)) for v in parent)
        got_groups = spark_rows(outdir, "d_dup_groups",
                                ["doc_id", "group_id"])
        ok &= check("d_dup_groups@" + sfdir + " (full union-find replay)",
                    got_groups, want_groups)
        # d_cc_stars computes the SAME labels by star contraction —
        # the same replay verifies it (and transitively its agreement
        # with d_dup_groups) at any sf
        if have("d_cc_stars"):
            got_stars = spark_rows(outdir, "d_cc_stars",
                                   ["doc_id", "group_id"])
            ok &= check("d_cc_stars@" + sfdir +
                        " (full union-find replay)",
                        got_stars, want_groups)
        # the streamed twin derives the SAME labels at read from the
        # incrementally-maintained pair MV — same replay verifies it
        if have("d_stream_dup_groups"):
            got_stream = spark_rows(outdir, "d_stream_dup_groups",
                                    ["doc_id", "group_id"])
            ok &= check("d_stream_dup_groups@" + sfdir +
                        " (full union-find replay)",
                        got_stream, want_groups)
    if have("d_cc_stars") and (mh is None or not have("d_dup_groups")):
        print("SKIP d_cc_stars (needs the d_minhash_pairs + "
              "d_dup_groups dumps)")
    if have("d_stream_dup_groups") and (mh is None
                                        or not have("d_dup_groups")):
        print("SKIP d_stream_dup_groups (needs the d_minhash_pairs + "
              "d_dup_groups dumps)")

    # ---- d_cluster_rep: FULL keeper-policy replay over the groups ----
    if have("d_cluster_rep") and not have("d_dup_groups"):
        print("SKIP d_cluster_rep (needs the d_dup_groups dump "
              "for its component relation)")
    if have("d_dup_groups") and have("d_cluster_rep"):
        groups = spark_rows(outdir, "d_dup_groups", ["doc_id", "group_id"])
        nchars = dict(con.execute(
            f"SELECT doc_id, n_chars FROM '{sfdir}/documents.parquet'"
        ).fetchall())
        by_gid = {}
        for doc, gid in groups:
            by_gid.setdefault(gid, []).append(doc)
        want_rep = []
        for gid, docs in by_gid.items():
            rep = min(docs, key=lambda d: (-nchars[d], d))
            for doc in docs:
                want_rep.append((doc, gid, rep, len(docs)))
        want_rep.sort()
        got_rep = spark_rows(outdir, "d_cluster_rep",
                             ["doc_id", "group_id", "rep_id", "group_sz"])
        ok &= check("d_cluster_rep@" + sfdir + " (full keeper replay)",
                    got_rep, want_rep)

    # ---- d_walk_counts: FULL matrix-power replay over the edges ----
    if have("d_walk_counts") and mh is None:
        print("SKIP d_walk_counts (needs the d_minhash_pairs dump "
              "for its edge relation)")
    if mh is not None and have("d_walk_counts"):
        adj = {}
        for a, b, _ in mh:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        c1 = {v: len(ns) for v, ns in adj.items()}
        c2 = {v: sum(c1[u] for u in ns) for v, ns in adj.items()}
        c3 = {v: sum(c2[u] for u in ns) for v, ns in adj.items()}
        want_walks = sorted((v, c1[v], c2[v], c3[v]) for v in adj)
        got_walks = spark_rows(outdir, "d_walk_counts",
                               ["doc_id", "walks_1", "walks_2", "walks_3"])
        ok &= check("d_walk_counts@" + sfdir + " (full matrix-power replay)",
                    got_walks, want_walks)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
