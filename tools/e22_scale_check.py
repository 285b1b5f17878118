#!/usr/bin/env python3
"""e22 scale audit for corpora where the full DuckDB oracle is intractable.

At sf10 (200k vectors, tau=0.25) the full oracle re-derives ~600M
candidate dot products and its bucket self-join spills >75 GB — DuckDB
cannot replay it on this box. This check proves the same contract with
two tractable parts:

1. SAMPLED EXACTNESS — rerun the oracle SQL itself, but restrict the
   pair join to a deterministic vec_id sample (vec_id % MOD == 0).
   Sound because a vector's (band, key) depends only on itself and the
   fixed plane matrix, and the degenerate-bucket prune is computed on
   the FULL corpus on both sides — so the full Spark run restricted to
   sampled pairs must equal DuckDB computing the sampled pairs under
   the identical global config. Catches missing pairs, extra pairs,
   banding/config divergence, and cosine mismatches, unbiased.
2. FULL-OUTPUT PROPERTY AUDIT — over every emitted pair (54M at sf10):
   distinctness, id_a < id_b, and the exact cosine recomputed in
   DuckDB from the embeddings (chunked by replica range so the join
   stays in memory) equals the stored value and clears the threshold.

Usage: e22_scale_check.py <sfdir> <verify_out_dir> [mod]
  <verify_out_dir> must hold e22_cosine_dup_lsh/ and oracle_sql.json
  from a `graft.Verify <sfdir> <out> e22_cosine_dup_lsh` run.
"""
import json
import sys

import duckdb

SHIFT = 10_000_000  # ScaleGen replica key shift (ScaleGen.scala)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 97
    con = duckdb.connect()
    con.sql("PRAGMA memory_limit='60GB'")
    emb = f"{sfdir}/embeddings.parquet"
    import os
    src = f"'{emb}/*.parquet'" if os.path.isdir(emb) else f"'{emb}'"
    con.sql(f"CREATE VIEW embeddings AS FROM read_parquet({src})")
    spark = f"read_parquet('{outdir}/e22_cosine_dup_lsh/*.parquet')"
    sql = json.load(open(f"{outdir}/oracle_sql.json"))["e22_cosine_dup_lsh"]

    # --- Part 1: sampled exactness ---------------------------------
    head, tail = sql.split("pairs AS (SELECT DISTINCT")
    assert "samp" not in sql, "oracle SQL changed shape; update this splice"
    sampled_sql = (
        head
        + f"samp AS (SELECT * FROM pruned WHERE vec_id % {mod} = 0),\n"
        + "pairs AS (SELECT DISTINCT"
        + tail.replace("FROM pruned a JOIN pruned b", "FROM samp a JOIN samp b")
    )
    want = con.sql(sampled_sql).df().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got = con.sql(
        f"SELECT id_a, id_b, cosine FROM {spark} "
        f"WHERE id_a % {mod} = 0 AND id_b % {mod} = 0 ORDER BY 1, 2"
    ).df()
    same = want.equals(got)
    print(f"SAMPLED-EXACT rows want={len(want)} got={len(got)} equal={same}")
    if not same:
        m = want.merge(got, on=["id_a", "id_b"], how="outer", indicator=True,
                       suffixes=("_w", "_g"))
        print(m[m._merge != "both"].head(10))
        both = m[m._merge == "both"]
        print(both[both.cosine_w != both.cosine_g].head(10))
        sys.exit(1)

    # --- Part 2: full-output property audit ------------------------
    n, ndist, badord = con.sql(
        f"SELECT count(*), count(DISTINCT (id_a, id_b)), "
        f"sum(CASE WHEN id_a >= id_b THEN 1 ELSE 0 END) FROM {spark}"
    ).fetchone()
    print(f"FULL rows={n} distinct={ndist} id_a>=id_b={badord}")
    assert n == ndist and badord == 0

    def dot(a, b):
        return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
                f"list_transform(list_zip({a}, {b}), "
                f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
                f"(acc, x) -> acc + x)")

    def nrm(a):
        return (f"sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
                f"list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), "
                f"(acc, x) -> acc + x))")

    hi_id = con.sql(f"SELECT max(id_a) FROM {spark}").fetchone()[0]
    step = 10 * SHIFT
    bad_total = 0
    lo = 0
    while lo <= hi_id:
        badc = con.sql(f"""
          SELECT count(*) FROM (SELECT p.cosine,
              round({dot('ea.embedding', 'eb.embedding')}
                    / ({nrm('ea.embedding')} * {nrm('eb.embedding')}), 4) AS want
            FROM {spark} p JOIN embeddings ea ON ea.vec_id = p.id_a
                           JOIN embeddings eb ON eb.vec_id = p.id_b
            WHERE p.id_a >= {lo} AND p.id_a < {lo + step})
          WHERE cosine <> want OR cosine < 0.25""").fetchone()[0]
        bad_total += badc
        print(f"chunk id_a in [{lo},{lo + step}): bad={badc}", flush=True)
        lo += step
    print(f"PROPERTY-AUDIT bad_cosine_rows={bad_total}")
    print("E22-SCALE " + ("PASS" if bad_total == 0 else "FAIL"))
    sys.exit(0 if bad_total == 0 else 1)


if __name__ == "__main__":
    main()
