#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle gate (driver-side deps only;
NOT part of the library). Reads each /tmp/vout/<q> parquet, runs the matching
oracle_sql.json query in DuckDB over the same sf tables, and compares
rows / schema / values.

DRIVER-FAITHFUL (round 9): the real gate hashes rendered values after sorting
columns by name, so dtype *flavor* differences the old lenient harness
tolerated are now hard failures, namely the three classes that produced 33
red CORRECTNESS_r08 rows:
  1. tz-aware vs naive timestamps (Spark TimestampType parquet output vs
     DuckDB naive TIMESTAMP)           -> schema fail
  2. DECIMAL output columns anywhere   -> schema fail (driver renders
     decimals with fixed scale; never matches the oracle's rendering)
  3. integer vs float dtype (DuckDB HUGEINT -> float64 vs Spark BIGINT)
     -> dtype fail before any value compare
Doubles still compare with a small relative tolerance (the driver rounds
doubles; proven >= 1e-12 in VERDICT r8), but ONLY when both sides are float.
"""
import json, math, sys, glob
import duckdb
import pyarrow as pa

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
ENV = 3 * 1.04 / math.sqrt(2 ** 16)  # approx envelope per BASELINE.md

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")


def type_class(t: pa.DataType) -> str:
    """Collapse an arrow type to the dtype class the driver's hash is
    sensitive to. Any class mismatch between engine and oracle is a fail."""
    if pa.types.is_integer(t): return "int"
    if pa.types.is_floating(t): return "float"
    if pa.types.is_decimal(t): return "decimal"
    if pa.types.is_timestamp(t):
        return "ts_tz" if t.tz is not None else "ts"
    if pa.types.is_date(t): return "date"
    if pa.types.is_boolean(t): return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t): return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t): return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_class(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(
            f"{t.field(i).name}:{type_class(t.field(i).type)}"
            for i in range(t.num_fields)) + ">"
    return str(t)


oracles = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skips = [], [], []
for q in sorted(oracles):
    if only and not any(q.startswith(o) for o in only):
        continue
    files = glob.glob(f"{out}/{q}/*.parquet")
    if not files:
        fails.append((q, "no spark output")); continue
    got_t = con.execute(f"SELECT * FROM read_parquet('{out}/{q}/*.parquet')").arrow()
    try:
        exp_t = con.execute(oracles[q]).arrow()
    except Exception as e:
        fails.append((q, f"oracle SQL error: {e}")); continue

    # --- strict schema gate (the driver's behavior) ---------------------
    gschema = {f.name: type_class(f.type) for f in got_t.schema}
    eschema = {f.name: type_class(f.type) for f in exp_t.schema}
    if sorted(gschema) != sorted(eschema):
        fails.append((q, f"columns differ: spark={sorted(gschema)} oracle={sorted(eschema)}")); continue
    bad = [c for c in gschema
           if gschema[c] in ("decimal", "ts_tz") or eschema[c] in ("decimal", "ts_tz")]
    if bad:
        fails.append((q, "forbidden output dtype (driver-hash-unsafe): " + ", ".join(
            f"{c}: spark={gschema[c]} oracle={eschema[c]}" for c in bad))); continue
    dt_bad = [c for c in gschema if gschema[c] != eschema[c]]
    if dt_bad:
        fails.append((q, "dtype mismatch: " + ", ".join(
            f"{c}: spark={gschema[c]} oracle={eschema[c]}" for c in dt_bad))); continue

    got, exp = got_t.to_pandas(), exp_t.to_pandas()
    gcols = sorted(got.columns)
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[gcols].sort_values(gcols).reset_index(drop=True)
    if len(g) != len(e):
        fails.append((q, f"row count: spark={len(g)} oracle={len(e)}")); continue
    # only sketch-estimate queries get the envelope; everything else exact
    approx = q.startswith(("q30_", "q31_", "q32_", "q33_", "q34_", "q36_"))
    ok, msg = True, ""
    for c in gcols:
        gv, ev = g[c], e[c]
        is_float = gschema[c] == "float"
        for i in range(len(gv)):
            a, b = gv.iloc[i], ev.iloc[i]
            if a is None or (isinstance(a, float) and math.isnan(a)):
                if b is None or (isinstance(b, float) and math.isnan(b)): continue
                ok, msg = False, f"{c}[{i}]: {a!r} vs {b!r}"; break
            if is_float:
                if b == 0: same = a == 0
                else: same = abs(float(a) - float(b)) / max(abs(float(b)), 1e-12) < 1e-9
                if not same: ok, msg = False, f"{c}[{i}]: {a!r} vs {b!r}"; break
            elif hasattr(a, "__int__") and hasattr(b, "__int__") and approx:
                if b != 0 and abs(int(a) - int(b)) / abs(int(b)) > ENV:
                    ok, msg = False, f"{c}[{i}]: approx {a} vs exact {b} > envelope"; break
                elif b == 0 and a != 0:
                    ok, msg = False, f"{c}[{i}]: approx {a} vs exact 0"; break
            elif str(a) != str(b):
                ok, msg = False, f"{c}[{i}]: {a!r} vs {b!r}"; break
        if not ok: break
    if ok:
        exact = "envelope" if approx else "exact"
        passes.append((q, f"{len(g)} rows {exact}"))
    else:
        fails.append((q, msg))

declared = set(json.load(open(f"{out}/oracle_sql.json")))
import os
for d in sorted(glob.glob(f"{out}/q*")):
    q = d.split("/")[-1]
    if os.path.isdir(d) and q not in declared and not only:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{q}/*.parquet')").fetchone()[0]
        skips.append((q, f"rows-only: {n} rows"))

print(f"== PASS ({len(passes)}) ==")
for q, m in passes: print(f"  {q}: {m}")
print(f"== ROWS-ONLY ({len(skips)}) ==")
for q, m in skips: print(f"  {q}: {m}")
print(f"== FAIL ({len(fails)}) ==")
for q, m in fails: print(f"  {q}: {m}")
sys.exit(1 if fails else 0)
