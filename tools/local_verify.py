#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Reads outDir/<name>/ parquet dumps written by graft.Verify and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB against the same
sf parquet tables, and compares (rows, schema-by-sorted-column-name,
multiset hash of values). Not shipped to Spark; dev tooling only.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def df_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.md5()
    for l in lines: h.update(l.encode()); h.update(b"\n")
    return h.hexdigest(), len(rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Big-SF runs spill; keep temp storage on a volume with headroom
    # (the r11 sf10 sweep died on a disk-full /tmp) and cap memory so
    # DuckDB spills instead of OOMing the sandbox.
    tmp = os.environ.get("DUCKDB_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    if os.environ.get("DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEM']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written tables are directories
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    # GenScale-derived dirs round-trip events.ts as BIGINT epoch-nanos
    # (Spark cannot write TIMESTAMP(NANOS)); rebuild the view so the
    # oracles' epoch_ns(ts) keeps working. make_timestamp takes epoch
    # MICROS — the same µs truncation DuckDB applies to a real
    # TIMESTAMP(NANOS) column, so oracle arithmetic is unchanged.
    try:
        (ts_type,) = [str(t) for c, t in zip(
            con.sql("SELECT * FROM events LIMIT 0").columns,
            con.sql("SELECT * FROM events LIMIT 0").types) if c == "ts"]
        if ts_type.upper() == "BIGINT":
            src = f"{sf_dir}/events.parquet"
            src = f"{src}/*.parquet" if os.path.isdir(f"{sf_dir}/events.parquet") else src
            con.execute("DROP VIEW events")
            con.execute(f"CREATE VIEW events AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM '{src}'")
    except Exception:
        pass  # no events table in this dir
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = os.environ.get("VERIFY_ONLY")
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only.split(",")}
    fails = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        try:
            spark_res = con.execute(f"SELECT * FROM '{pdir}/*.parquet'")
            scols = [d[0] for d in spark_res.description]
            srows = spark_res.fetchall()
            duck_res = con.execute(sql)
            dcols = [d[0] for d in duck_res.description]
            drows = duck_res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        # Driver-side compare goes through pandas, where DuckDB HUGEINT
        # (e.g. sum(BIGINT)) coerces to float64 and formats "123.0" vs
        # Spark's "123" -> hash mismatch. Lint: oracle must cast such sums.
        rel = con.sql(sql)
        # pandas-coercion lint: the driver's compare goes through pandas,
        # where HUGEINT (e.g. sum(BIGINT)) and DECIMAL become float64 and
        # format "123.0" vs Spark's "123"/exact — oracles must cast such
        # columns (bigint / double) explicitly. TIMESTAMP WITH TIME ZONE
        # formats with an offset suffix Spark never emits.
        bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
               if str(t).upper() in ("HUGEINT", "UHUGEINT")
               or str(t).upper().startswith("DECIMAL")
               or "TIME ZONE" in str(t).upper()]
        if bad:
            print(f"FAIL {name}: oracle emits pandas-coercion-risky cols {bad} "
                  f"(cast to bigint/double in the oracle SQL)")
            fails += 1; continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            fails += 1; continue
        sh, sn = df_hash(scols, srows)
        dh, dn = df_hash(dcols, drows)
        if sh != dh:
            print(f"FAIL {name}: hash mismatch rows {sn} vs {dn}")
            # show first differing rows for debug
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ss = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
            dd = sorted("|".join(canon(r[i]) for i in order_d) for r in drows)
            for a, b in zip(ss, dd):
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}"); break
            fails += 1
        else:
            print(f"OK   {name}: {sn} rows")
    print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"))
