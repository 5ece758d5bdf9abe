#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each SparkEntry query,
compare the Verify parquet dump against the DuckDB oracle SQL on the same
scale dir. Usage: oracle_check.py <sfDir> <verifyOutDir>.

Protocol per the driver: columns sorted by name, values compared row-wise
after sorting; floats normalized. Reports per-query rows/schema/values."""
import sys, json, glob, os
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    bad = 0
    for q in sorted(oracles):
        spark_dir = os.path.join(out, q)
        if not os.path.isdir(spark_dir):
            print(f"{q:32s} MISSING spark output"); bad += 1; continue
        try:
            r = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            s_rows, s_cols = r.fetchall(), [d[0] for d in r.description]
            r = con.execute(oracles[q])
            o_rows, o_cols = r.fetchall(), [d[0] for d in r.description]
        except Exception as e:
            print(f"{q:32s} ERR {str(e)[:120]}"); bad += 1; continue
        sc, sv = canon(s_rows, s_cols)
        oc, ov = canon(o_rows, o_cols)
        rows_ok, schema_ok, vals_ok = len(sv) == len(ov), sc == oc, sv == ov
        if rows_ok and schema_ok and vals_ok:
            print(f"{q:32s} OK    ({len(sv)} rows)")
        else:
            bad += 1
            print(f"{q:32s} FAIL  rows={len(sv)}/{len(ov)} schema_ok={schema_ok} vals_ok={vals_ok}")
            if not schema_ok:
                print(f"    spark cols:  {sc}\n    oracle cols: {oc}")
            elif rows_ok:
                for a, b in zip(sv, ov):
                    if a != b:
                        print(f"    first diff:\n      spark:  {a}\n      oracle: {b}")
                        break
    print(f"\n{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'} "
          f"({len(oracles)} oracles)")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
