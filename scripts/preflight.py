#!/usr/bin/env python3
"""Local differential-oracle preflight: mimics the driver's t2 check.

Usage: python3 scripts/preflight.py <sfDir> <verifyOutDir> [query...]

Loads <verifyOutDir>/oracle_sql.json, registers each testdata table as a
DuckDB view, runs every oracle SQL, and compares against the Spark result
parquet (written by `graft.Verify`) — row count, schema (column names +
arrow types, sorted by name), and exact values in row order.
"""
import sys, os, json, glob
import duckdb
import pyarrow as pa
import numpy as np

# The determinism rules baked into the oracle SQL (SURVEY §7.2: -0.0
# normalization, avg() result typing, epoch_us semantics, hugeint casts)
# were validated against exactly this DuckDB. A silently different oracle
# version would misattribute its own behavior changes as Spark failures.
EXPECTED_DUCKDB = "1.0.0"
if duckdb.__version__ != EXPECTED_DUCKDB:
    sys.exit(f"preflight: duckdb {duckdb.__version__} != pinned {EXPECTED_DUCKDB} "
             "- re-validate SURVEY §7.2 parity rules before trusting results")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_type(t: pa.DataType) -> str:
    # Normalize representations that differ only in encoding, not semantics.
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{norm_type(t.value_type)}>"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit},tz={t.tz}]"
    return str(t)

def cols(tbl: pa.Table):
    return sorted(tbl.column_names)

def compare(name, spark_tbl: pa.Table, ora_tbl: pa.Table):
    errs = []
    if spark_tbl.num_rows != ora_tbl.num_rows:
        errs.append(f"rows spark={spark_tbl.num_rows} oracle={ora_tbl.num_rows}")
    sc, oc = cols(spark_tbl), cols(ora_tbl)
    if sc != oc:
        errs.append(f"columns spark={sc} oracle={oc}")
        return errs
    for c in sc:
        st = norm_type(spark_tbl.schema.field(c).type)
        ot = norm_type(ora_tbl.schema.field(c).type)
        if st != ot:
            errs.append(f"type[{c}] spark={st} oracle={ot}")
        # POLICY: decimal output columns are banned. The driver's hash
        # stringifies values; fixed-scale Decimal ('152936.00') vs float
        # ('152936.0') hash-differ despite numeric equality — the exact
        # r01 failure mode (b1/d1/d5/d6/f3). Compute in DECIMAL, emit DOUBLE.
        for side, t in (("spark", spark_tbl), ("oracle", ora_tbl)):
            if pa.types.is_decimal(t.schema.field(c).type):
                errs.append(f"policy[{c}] {side} emits DECIMAL — cast final output to DOUBLE/BIGINT")
    if errs:
        return errs
    for c in sc:
        a = spark_tbl.column(c).to_pylist()
        b = ora_tbl.column(c).to_pylist()
        if len(a) != len(b):
            continue
        for i, (x, y) in enumerate(zip(a, b)):
            eq = (x == y) or (x is None and y is None) or (
                isinstance(x, float) and isinstance(y, float) and np.isnan(x) and np.isnan(y))
            # driver-hash proxy: the string representations must ALSO agree
            # (catches Decimal-vs-float scale drift, -0.0 vs 0.0, int vs bool).
            if eq and x is not None and str(x) != str(y):
                errs.append(f"repr[{c}] row {i}: spark={x!r} vs oracle={y!r} (equal but str-differ)")
                break
            if not eq:
                errs.append(f"value[{c}] row {i}: spark={x!r} oracle={y!r}")
                break
    return errs

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    missing = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            missing.append(name)
            continue
        try:
            spark_tbl = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            ora_tbl = con.sql(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        errs = compare(name, spark_tbl, ora_tbl)
        if errs:
            n_fail += 1
            print(f"FAIL {name} ({spark_tbl.num_rows} rows):")
            for e in errs[:6]:
                print(f"   {e}")
            # Dedup-key diagnostic (r15 ADVICE): the banded-LSH oracles
            # (j2/l1/l12) are exact-equality constructions that are sound
            # only while banding recall is 1.0. If one ever fails, say
            # WHICH failure mode it is: spark-rows ⊂ oracle-rows means a
            # banding recall MISS (a true pair never collided — the
            # documented ~5e-6/pair probabilistic risk, not a value bug);
            # anything else is a genuine computation mismatch.
            if name.split("_")[0] in ("j2", "l1", "l12") and \
                    cols(spark_tbl) == cols(ora_tbl):
                def keyset(t):
                    cs = [t.column(c).to_pylist() for c in cols(t)]
                    return set(zip(*cs)) if cs and cs[0] else set()
                s_rows, o_rows = keyset(spark_tbl), keyset(ora_tbl)
                if s_rows < o_rows:
                    print("   hint: spark rows are a STRICT SUBSET of the "
                          "oracle rows -> banding recall miss (an uncollided "
                          "true pair), not a value computation bug")
                elif s_rows - o_rows and not (o_rows - s_rows):
                    print("   hint: spark emitted rows the oracle lacks -> "
                          "banding admitted a below-threshold pair past the "
                          "exact gate; check the verify stage, not the bands")
        else:
            n_pass += 1
            print(f"PASS {name} ({spark_tbl.num_rows} rows)")
    for name in missing:
        print(f"MISS {name}: no spark output parquet")
    print(f"== {n_pass} pass, {n_fail} fail, {len(missing)} missing ==")
    sys.exit(1 if (n_fail or missing) else 0)

if __name__ == "__main__":
    main()
