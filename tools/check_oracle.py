#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables, load the Verify parquet output,
sort columns by name + rows by value, and compare cell-by-cell.

STRICTNESS (round 13): the r9-r12 q_rolling_corr red was a DuckDB
HUGEINT oracle column rendered as float64 by pandas, which the old
norm() (int-valued float -> int string) silently equated with Spark's
int64 — 3 rounds of "0 rows differ" locally while the driver's
dtype-sensitive hasher stayed red. The local gate must be AT LEAST as
strict as the driver:
  * each cell's compare key now includes its dtype KIND (int / float /
    bool / str / ...), so an int64 Spark column vs a float64-rendered
    oracle column FAILS even when every value is integral;
  * before any row compare, a catalog-wide dtype AUDIT runs: every
    oracle is DESCRIBEd and any HUGEINT / DECIMAL(38,0) / DOUBLE output
    column whose Spark parquet twin is integral fails the run.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name ...]
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT_KINDS = ("int8", "int16", "int32", "int64",
             "uint8", "uint16", "uint32", "uint64")


def kind(dtype):
    """Collapse a pandas/duckdb dtype to the equivalence class the
    driver's hasher distinguishes: ints hash as 1234, floats as 1234.0,
    so int-vs-float MUST be a distinct kind (that is the whole bug)."""
    s = str(dtype).lower()
    if s.startswith(INT_KINDS):
        return "i"
    if s.startswith(("float", "double")):
        return "f"
    if s.startswith("bool"):
        return "b"
    if s.startswith(("datetime", "timestamp")):
        return "t"
    if s == "object" or s.startswith(("str", "category")):
        return "s"
    return s


def norm(v):
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return (f"{v:.10g}",)
    return (str(v),)


def key(row, kinds):
    return tuple(x for c, k in zip(row, kinds) for x in (k,) + norm(c))


def audit_dtypes(con, oracle, got_schemas, got_sqltypes=None):
    """DESCRIBE every oracle; fail any output column whose DuckDB type
    the driver's hasher would distinguish from the Spark parquet twin:
      * widened numerics (HUGEINT / DECIMAL(38,0) / DOUBLE) against an
        integral twin — they render as float in pandas (the r9-r12
        q_rolling_corr class);
      * VARCHAR against an integral twin (and integral against a
        string twin) — '42' vs 42 hash differently;
      * TIMESTAMP WITH TIME ZONE against a tz-naive twin (and the
        reverse) — both collapse to kind 't' in the row compare, so
        only this audit can see the tz flag;
      * DATE against a TIMESTAMP twin (VERDICT r14 #8) — this gate
        loads Spark's parquet THROUGH DuckDB, whose fetchdf renders
        both as datetime64[us] (a midnight timestamp equals the date),
        while the driver reads the parquet natively and hashes date32
        vs timestamp differently — so the only local witness is the
        SQL-level type pair (got_sqltypes = DESCRIBE of the Spark
        parquet), not the pandas dtype.
    Catches the bug class at authoring time instead of three driver
    rounds later."""
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"AUDIT-ERROR {name}: {e}")
            n_bad += 1
            continue
        spark = got_schemas.get(name, {})
        for col, typ in ((d[0], str(d[1]).upper()) for d in desc):
            sdt = spark.get(col, "")
            skind = kind(sdt)
            widened = ("HUGEINT" in typ or "INT128" in typ
                       or typ.startswith("DECIMAL(38,0)")
                       or typ in ("DOUBLE", "FLOAT", "REAL"))
            if widened and skind == "i":
                print(f"AUDIT-FAIL {name}.{col}: oracle type {typ} "
                      f"renders as float in pandas but Spark emits "
                      f"{sdt} — add an explicit CAST in the SQL")
                n_bad += 1
            ora_int = typ in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                              "UTINYINT", "USMALLINT", "UINTEGER",
                              "UBIGINT")
            if typ == "VARCHAR" and skind == "i":
                print(f"AUDIT-FAIL {name}.{col}: oracle VARCHAR vs "
                      f"Spark {sdt} — '42' and 42 hash differently; "
                      f"CAST one side")
                n_bad += 1
            if ora_int and skind == "s":
                print(f"AUDIT-FAIL {name}.{col}: oracle {typ} vs "
                      f"Spark string twin — CAST one side")
                n_bad += 1
            if skind == "t":
                ora_tz = "WITH TIME ZONE" in typ or "TIMESTAMPTZ" in typ
                spark_tz = "," in sdt  # pandas datetime64[us, UTC]
                if "TIMESTAMP" in typ and ora_tz != spark_tz:
                    print(f"AUDIT-FAIL {name}.{col}: timestamp tz "
                          f"mismatch — oracle {typ} vs Spark {sdt}; "
                          f"the hasher renders the tz flag")
                    n_bad += 1
            stype = (got_sqltypes or {}).get(name, {}).get(col, "").upper()
            if stype:
                s_date = stype == "DATE"
                o_date = typ == "DATE"
                s_ts = "TIMESTAMP" in stype
                o_ts = "TIMESTAMP" in typ
                if (s_date and o_ts) or (s_ts and o_date):
                    print(f"AUDIT-FAIL {name}.{col}: DATE-vs-TIMESTAMP "
                          f"kind pair — Spark parquet {stype} vs oracle "
                          f"{typ}; identical here via DuckDB's "
                          f"datetime64 render but the driver hashes "
                          f"date32 and timestamp differently — CAST "
                          f"one side")
                    n_bad += 1
                # DOUBLE-vs-DECIMAL (VERDICT r15 #8): this gate loads
                # Spark's parquet THROUGH DuckDB, whose fetchdf renders
                # parquet decimal128 and DOUBLE both as float64, so the
                # pandas-kind compare is blind to the pair — but the
                # driver reads the parquet natively: a Spark decimal
                # column arrives as Decimal objects ('1234.50') while
                # the oracle's DOUBLE renders 1234.5, and they hash
                # differently even when numerically equal. The
                # e6-fixed-point discipline (decimal(38,0) intermediates)
                # makes an output-position decimal the likeliest silent
                # regression. Flag ANY decimal-vs-nondecimal numeric
                # pairing, both directions.
                NUMERIC = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                           "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
                           "UBIGINT", "DOUBLE", "FLOAT", "REAL")
                s_dec = stype.startswith("DECIMAL")
                o_dec = typ.startswith("DECIMAL")
                s_num = s_dec or stype in NUMERIC
                o_num = o_dec or typ in NUMERIC
                if s_num and o_num and s_dec != o_dec:
                    print(f"AUDIT-FAIL {name}.{col}: DECIMAL kind pair "
                          f"— Spark parquet {stype} vs oracle {typ}; "
                          f"identical here via DuckDB's float64 render "
                          f"but the driver reads parquet decimals as "
                          f"Decimal objects and hashes them differently "
                          f"— CAST one side")
                    n_bad += 1
    return n_bad


def selftest():
    """Deliberately mistyped probe oracles proving every audit case
    fires (VERDICT r13 #8 'exercised-stays-honest' for the audit)."""
    import pandas as pd  # noqa: F401 (ensures pandas backs fetchdf)
    con = duckdb.connect()
    got_schemas = {
        "probe_hugeint": {"c": "int64"},
        "probe_varchar": {"c": "int64"},
        "probe_int_vs_str": {"c": "object"},
        "probe_tz": {"t": "datetime64[us]"},
        "probe_ntz": {"t": "datetime64[us, UTC]"},
        "probe_date_vs_ts": {"d": "datetime64[us]"},
        # DuckDB's fetchdf renders BOTH parquet decimal128 and DOUBLE
        # as float64 — the pandas layer is structurally blind here,
        # which is exactly why the SQL-level probe must fire.
        "probe_dbl_vs_dec": {"c": "float64"},
        "probe_dec_vs_int": {"c": "float64"},
        "probe_clean": {"c": "int64", "t": "datetime64[us]",
                        "d": "datetime64[us]", "x": "float64"},
    }
    got_sqltypes = {
        # Spark wrote date32; the oracle (below) says TIMESTAMP — the
        # datetime64 pandas dtype is identical, only this catches it.
        "probe_date_vs_ts": {"d": "DATE"},
        # Spark wrote DOUBLE; the oracle returns DECIMAL (and the
        # reverse) — the VERDICT r15 #8 kind pair, both directions.
        "probe_dbl_vs_dec": {"c": "DOUBLE"},
        "probe_dec_vs_int": {"c": "DECIMAL(38,0)"},
        "probe_clean": {"c": "BIGINT", "t": "TIMESTAMP", "d": "DATE",
                        "x": "DOUBLE"},
    }
    oracle = {
        "probe_hugeint": "SELECT sum(x) AS c FROM (VALUES (1), (2)) v(x)",
        "probe_varchar": "SELECT '42' AS c",
        "probe_int_vs_str": "SELECT 42 AS c",
        "probe_tz": "SELECT TIMESTAMPTZ '2020-01-01 00:00:00+00' AS t",
        "probe_ntz": "SELECT TIMESTAMP '2020-01-01 00:00:00' AS t",
        "probe_date_vs_ts": "SELECT TIMESTAMP '2020-01-01 00:00:00' AS d",
        "probe_dbl_vs_dec": "SELECT CAST(1.5 AS DECIMAL(18,2)) AS c",
        "probe_dec_vs_int": "SELECT CAST(2 AS BIGINT) AS c",
        "probe_clean":
            "SELECT CAST(1 AS BIGINT) AS c, "
            "TIMESTAMP '2020-01-01 00:00:00' AS t, "
            "DATE '2020-01-01' AS d, CAST(1.5 AS DOUBLE) AS x",
    }
    n_bad = audit_dtypes(con, oracle, got_schemas, got_sqltypes)
    assert n_bad == 8, f"expected exactly 8 audit fires, got {n_bad}"
    print("== selftest ok: all 8 mistyped probes fired, clean probe "
          "passed")
    return 0


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    # Pass 0: load Spark outputs' schemas for the dtype audit — both
    # the pandas dtypes (kind audit) and the SQL-level DESCRIBE types
    # (DATE-vs-TIMESTAMP audit, invisible at the pandas layer).
    got_schemas = {}
    got_sqltypes = {}
    for name in oracle:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if files:
            df0 = con.execute(
                f"SELECT * FROM read_parquet({files!r}) LIMIT 0").fetchdf()
            got_schemas[name] = {c: str(df0[c].dtype) for c in df0.columns}
            desc = con.execute(
                f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()
            got_sqltypes[name] = {d[0]: str(d[1]).upper() for d in desc}
    n_bad = audit_dtypes(con, oracle, got_schemas, got_sqltypes)
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
            got = got.reindex(sorted(got.columns), axis=1)
            want = want.reindex(sorted(want.columns), axis=1)
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} "
                      f"vs oracle {list(want.columns)}")
                n_bad += 1
                continue
            gk = [kind(got[c].dtype) for c in got.columns]
            wk = [kind(want[c].dtype) for c in want.columns]
            if gk != wk:
                diffs = [(c, a, b) for c, a, b
                         in zip(got.columns, gk, wk) if a != b]
                print(f"FAIL {name}: dtype kinds differ {diffs} "
                      f"(spark vs oracle) — driver hashes these "
                      f"differently even if values match")
                n_bad += 1
                continue
            g = sorted([key(r, gk) for r in got.itertuples(index=False)])
            w = sorted([key(r, wk) for r in want.itertuples(index=False)])
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs oracle {len(w)}")
                n_bad += 1
                continue
            bad = [(a, b) for a, b in zip(g, w) if a != b]
            if bad:
                print(f"FAIL {name}: {len(bad)} mismatched rows; "
                      f"first: {bad[0][0]} vs {bad[0][1]}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(g)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    if sys.argv[1:2] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3:]) or None))
