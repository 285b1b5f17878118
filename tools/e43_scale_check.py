#!/usr/bin/env python3
"""e43 replica-decomposition audit for corpora where the full DuckDB
oracle is intractable (the gram self-join at sf30 is the same family
as e4's, which already spills past this box at sf10).

ScaleGen replicates documents with doc_id += r*SHIFT and a per-replica
character-permutation cipher on [a-zA-Z0-9] (ScaleGen.scala:143-146)
while lang/source stay fixed. Under a 1:1 character substitution the
set of distinct character 3-grams of the normalized text maps 1:1, so
within a replica every (pair, containment) value is IDENTICAL to the
base corpus shifted by r*SHIFT (case classes are preserved, so the
cipher commutes with the lowercasing normalizer), and a >=0.8 gram
containment ACROSS differently-permuted replicas is a ~1/26!-class
coincidence. Therefore the full sf{N} output
must decompose into exactly N_replicas key-shifted copies of the
DuckDB-verified sf0.1 base with zero cross-replica pairs — which is
what this script checks, exactly and over every emitted row:

1. zero pairs with floor(doc_a/SHIFT) != floor(doc_b/SHIFT);
2. per-replica row count == base row count for all replicas;
3. the distinct set of (doc_a % SHIFT, doc_b % SHIFT, containment)
   across ALL replicas == the base set (so total == N * base).

Usage: e43_scale_check.py <base_out> <scale_out> <n_replicas>
  <base_out>/<scale_out> hold e43_ngram_containment/ parquet from
  `graft.Verify <sfdir> <out> e43_ngram_containment` runs at sf0.1
  and the scaled corpus; the sf0.1 run must already be oracle-green
  (tools/compare_oracle.py) so the base is DuckDB-verified.
"""
import sys

import duckdb

SHIFT = 10_000_000  # ScaleGen replica key shift (ScaleGen.scala)


def main():
    base_out, scale_out, nrep = sys.argv[1], sys.argv[2], int(sys.argv[3])
    con = duckdb.connect()
    con.sql("PRAGMA memory_limit='60GB'")
    base = f"read_parquet('{base_out}/e43_ngram_containment/*.parquet')"
    big = f"read_parquet('{scale_out}/e43_ngram_containment/*.parquet')"

    nbase = con.sql(f"SELECT count(*) FROM {base}").fetchone()[0]
    cross = con.sql(
        f"SELECT count(*) FROM {big} "
        f"WHERE doc_a // {SHIFT} <> doc_b // {SHIFT}").fetchone()[0]
    print(f"base_rows={nbase} cross_replica_pairs={cross}")

    per = con.sql(
        f"SELECT count(DISTINCT r), min(c), max(c) FROM "
        f"(SELECT doc_a // {SHIFT} AS r, count(*) AS c FROM {big} GROUP BY 1)"
    ).fetchone()
    nreps_seen, cmin, cmax = per
    print(f"replicas_seen={nreps_seen} rows_per_replica=[{cmin},{cmax}]")

    # set equality of shifted pairs vs the base, both directions
    mism = con.sql(f"""
      SELECT count(*) FROM (
        SELECT doc_a % {SHIFT} AS a, doc_b % {SHIFT} AS b, containment
        FROM {big}
        EXCEPT
        SELECT doc_a, doc_b, containment FROM {base}
      )""").fetchone()[0]
    miss = con.sql(f"""
      SELECT count(*) FROM (
        SELECT doc_a, doc_b, containment FROM {base}
        EXCEPT
        SELECT DISTINCT doc_a % {SHIFT}, doc_b % {SHIFT}, containment
        FROM {big}
      )""").fetchone()[0]
    total = con.sql(f"SELECT count(*) FROM {big}").fetchone()[0]
    print(f"total={total} want={nrep * nbase} "
          f"extra_shifted={mism} missing_from_base={miss}")

    ok = (cross == 0 and nreps_seen == nrep and cmin == cmax == nbase
          and mism == 0 and miss == 0 and total == nrep * nbase)
    print("E43-SCALE " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
