#!/usr/bin/env python3
"""DuckDB-native large-SF twin of compare_oracle.py.

Usage: python3 tools/compare_oracle_duck.py <sfdir> <verify_out_dir> [only,names]

Same contract as compare_oracle.py (PASS/FAIL per query, rows-only
report for non-oracled results) but the value compare runs entirely
inside DuckDB as a two-sided EXCEPT ALL, so it stays vectorized and
out-of-core on multi-GB results (the pandas canon's object-dtype
mergesort is quadratic-ish on 30M-row array columns and unusable past
sf10). Intended for the sf30 due-diligence sweeps; the driver-gate
mimic at sf<=0.1 stays compare_oracle.py because its pandas dtype-kind
check exactly mirrors the driver's hash sensitivity (a DuckDB HUGEINT
sum reads as integer-class here but float64 in the driver's pandas
load — scale-independent, so it is already caught at sf0.01).

Type canon before the EXCEPT: both sides cast per-column to a common
class — any float/decimal side -> DOUBLE, integers -> HUGEINT,
timestamps -> TIMESTAMP, float lists -> DOUBLE[], everything else
as-declared. Float compare is exact (same strictness as the pandas
tool); NULLs compare equal under set-op semantics, matching the
pandas isna()&isna() clause; DuckDB treats NaN as an orderable value
so NaN rows also pair up.
"""
import json, sys, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def common_cast(got_type: str, want_type: str):
    """Return a SQL type both sides are cast to, or None for as-is."""
    g, w = got_type.upper(), want_type.upper()

    def cls(t):
        if t.endswith("[]"):
            return "list:" + cls(t[:-2])
        if t in ("FLOAT", "REAL", "DOUBLE") or t.startswith("DECIMAL"):
            return "f"
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"):
            return "i"
        if t.startswith("TIMESTAMP"):
            return "ts"
        return t

    cg, cw = cls(g), cls(w)
    if cg.startswith("list:") or cw.startswith("list:"):
        eg = cg.split(":", 1)[1] if cg.startswith("list:") else cg
        ew = cw.split(":", 1)[1] if cw.startswith("list:") else cw
        if "f" in (eg, ew):
            return "DOUBLE[]"
        if eg == ew == "i":
            return "HUGEINT[]"
        return None if g == w else "VARCHAR"
    if "f" in (cg, cw) and cw in ("i", "f") and cg in ("i", "f"):
        return "DOUBLE"
    if cg == cw == "i":
        return None if g == w else "HUGEINT"
    if cg == cw == "ts":
        return None if g == w else "TIMESTAMP"
    return None if g == w else "VARCHAR"


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    con.sql("SET temp_directory='/tmp/duck_spill'")
    con.sql("SET memory_limit='48GB'")
    # bound the spill: a runaway plan must error, not fill the disk
    con.sql("SET max_temp_directory_size='40GB'")
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.sql(f"CREATE VIEW __raw_{t} AS FROM {src}")
        cols = {r[0]: r[1] for r in con.sql(f"DESCRIBE __raw_{t}").fetchall()}
        if t == "events" and cols.get("ts") == "BIGINT":
            con.sql(f"""CREATE VIEW {t} AS
                SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) FROM __raw_{t}""")
        else:
            con.sql(f"CREATE VIEW {t} AS FROM __raw_{t}")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        if not os.path.isdir(f"{outdir}/{name}"):
            results[name] = "MISSING result dir (query threw during Verify?)"
            print(f"FAIL {name}  {results[name]}", flush=True)
            continue
        try:
            con.sql("DROP TABLE IF EXISTS __got")
            con.sql("DROP TABLE IF EXISTS __want")
            # TEMP TABLES, not views: a view re-evaluates the oracle in
            # BOTH branches of the two-sided EXCEPT (plus the row
            # count) — a heavy oracle then triples its cost and can
            # spill past the disk (seen live on e50 at sf30)
            con.sql(f"CREATE TEMP TABLE __got AS FROM '{outdir}/{name}/*.parquet'")
            con.sql(f"CREATE TEMP TABLE __want AS ({oracle[name]})")
            gt = dict(
                (r[0], r[1]) for r in con.sql("DESCRIBE __got").fetchall())
            wt = dict(
                (r[0], r[1]) for r in con.sql("DESCRIBE __want").fetchall())
            if sorted(gt) != sorted(wt):
                results[name] = f"SCHEMA got={sorted(gt)} want={sorted(wt)}"
                print(f"FAIL {name}  {results[name]}", flush=True)
                continue
            sel_g, sel_w = [], []
            for c in sorted(gt):
                cast = common_cast(gt[c], wt[c])
                q = f'"{c}"'
                sel_g.append(f"CAST({q} AS {cast}) AS {q}" if cast else q)
                sel_w.append(f"CAST({q} AS {cast}) AS {q}" if cast else q)
            ng = con.sql("SELECT count(*) FROM __got").fetchone()[0]
            nw = con.sql("SELECT count(*) FROM __want").fetchone()[0]
            if ng != nw:
                results[name] = f"ROWS got={ng} want={nw}"
                print(f"FAIL {name}  {results[name]}", flush=True)
                continue
            diff = con.sql(f"""
                SELECT count(*) FROM (
                  (SELECT {', '.join(sel_g)} FROM __got
                   EXCEPT ALL
                   SELECT {', '.join(sel_w)} FROM __want)
                  UNION ALL
                  (SELECT {', '.join(sel_w)} FROM __want
                   EXCEPT ALL
                   SELECT {', '.join(sel_g)} FROM __got))
            """).fetchone()[0]
            results[name] = "OK" if diff == 0 else f"VALUES {diff} differing rows (two-sided EXCEPT ALL)"
            print(f"{'PASS' if diff == 0 else 'FAIL'} {name}"
                  + ("" if diff == 0 else f"  {results[name]}"), flush=True)
        except Exception as ex:
            results[name] = f"ERROR {str(ex)[:200]}"
            print(f"FAIL {name}  {results[name]}", flush=True)
    npass = sum(1 for v in results.values() if v == "OK")
    print(f"\n{npass}/{len(results)} oracle queries match", flush=True)
    for d in sorted(glob.glob(f"{outdir}/*")):
        name = os.path.basename(d)
        if os.path.isdir(d) and name not in oracle and (only is None or name in only):
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
