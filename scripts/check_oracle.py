#!/usr/bin/env python3
"""Dev-side mirror of the driver's t2 correctness gate (NOT library code —
the engine itself is pure Scala/Spark; this script only exists so oracle
mismatches surface before the driver runs).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import duckdb, glob, json, sys

import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            ora_df = con.sql(oracle[name]).df()
            # STRUCTURAL LINT (round-15): no DECIMAL in any EMITTED
            # schema, either engine. The driver's hasher canonicalizes
            # DECIMAL differently from both engines' value semantics,
            # and the astype(float64) coercion below cannot see it —
            # d137/d138 shipped "bit-exact" locally in round 14 and
            # failed the driver's hash. Doubles on the 6-dp grid /
            # BIGINTs are the only sanctioned numeric output types.
            dec_cols = [
                f"{side}:{r[0]}"
                for side, probe in (
                    ("spark", f"SELECT * FROM read_parquet({files!r})"),
                    ("oracle", oracle[name]))
                for r in con.sql(f"DESCRIBE {probe}").fetchall()
                if "DECIMAL" in str(r[1]).upper()
                or "HUGEINT" in str(r[1]).upper()]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        a, b = norm(spark_df), norm(ora_df)
        problems = []
        if dec_cols:
            problems.append(
                "DECIMAL/HUGEINT output column(s) "
                + ", ".join(dec_cols)
                + " — the driver hashes these differently; finish as "
                  "CAST(... AS DOUBLE) or BIGINT on BOTH engines")
        if list(a.columns) != list(b.columns):
            problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        elif a.shape != b.shape:
            problems.append(f"shape {a.shape} vs {b.shape}")
        else:
            for c in a.columns:
                av, bv = a[c], b[c]
                # TYPE-STRICT (round-9): the driver hashes dtypes, so an
                # integer-vs-float (or HUGEINT-vs-BIGINT → object/float)
                # divergence must fail HERE, not only at the driver. The
                # old astype(float) coercion shipped d42_survival red as
                # "154/154 bit-exact" in round 8.
                def _cls(d):
                    if np.issubdtype(d, np.integer):
                        return "int"
                    if np.issubdtype(d, np.floating):
                        return "float"
                    return str(d)
                if _cls(av.dtype) != _cls(bv.dtype):
                    problems.append(
                        f"col {c}: dtype class {av.dtype} vs {bv.dtype} "
                        "(driver hashes types — cast the oracle)")
                    continue
                if (np.issubdtype(av.dtype, np.integer)
                        and np.issubdtype(bv.dtype, np.integer)):
                    bad = av.values.astype(np.int64) != bv.values.astype(np.int64)
                    if bad.any():
                        problems.append(f"col {c}: {bad.sum()} int cells differ")
                elif np.issubdtype(av.dtype, np.number) and np.issubdtype(bv.dtype, np.number):
                    # BIT-STRICT (round-11): the driver hashes float BIT
                    # patterns, so compare float64 bits, not np.isclose.
                    # The old rtol=1e-12 compare treated -0.0 == +0.0 and
                    # shipped d76_covariance red as "247/247 bit-exact"
                    # in round 10 (SURVEY §5.3 signed-zero rule). NaNs
                    # are normalized first (both-NaN cells match).
                    avf = av.astype(np.float64).values.copy()
                    bvf = bv.astype(np.float64).values.copy()
                    both_nan = np.isnan(avf) & np.isnan(bvf)
                    avf[both_nan] = 0.0
                    bvf[both_nan] = 0.0
                    bad = avf.view(np.int64) != bvf.view(np.int64)
                    if bad.any():
                        sz = int((bad & (avf == bvf)).sum())  # ±0.0 cells
                        diff = np.abs(avf - bvf)
                        problems.append(
                            f"col {c}: {bad.sum()} cells bit-differ "
                            f"(signed-zero: {sz}), max |Δ|={np.nanmax(np.where(bad, diff, 0.0)):.3g}")
                else:
                    bad = av.astype(str).values != bv.astype(str).values
                    if bad.any():
                        i = int(np.argmax(bad))
                        problems.append(f"col {c}: {bad.sum()} cells differ, e.g. "
                                        f"{av.iloc[i]!r} vs {bv.iloc[i]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            exact = "exact" if a.equals(b) else "tolerance"
            print(f"PASS {name} rows={len(a)} ({exact})")
    print(f"{len(oracle) - failures}/{len(oracle)} queries pass")

    # Any query Verify recorded as FAILED fails this gate too — a
    # rows-only query (no oracle entry) that threw would otherwise be
    # invisible to the exit code (its _verify_error placeholder dir
    # even counts as "present").
    import os, re
    try:
        verrs = json.load(open(f"{outdir}/verify_errors.json"))
    except Exception:
        verrs = {}
    if verrs:
        print(f"VERIFY ERRORS ({len(verrs)}): " + ", ".join(sorted(verrs)))
        failures += len(verrs)

    # Coverage must be a SUPERSET of the last recorded round: round 7
    # silently lost 11 event-time queries (they failed to plan, left no
    # output, and nothing compared the name sets). Diff against the
    # newest committed CORRECTNESS_r*.json so a shrink is loud here
    # before the driver ever runs. The current set comes from
    # query_names.json (what THIS run actually executed) — directory
    # listing alone would count stale dirs from a previous Verify into
    # the same outdir as coverage.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        (f for f in os.listdir(repo) if re.match(r"CORRECTNESS_r\d+\.json$", f)),
        key=lambda f: int(re.search(r"\d+", f).group()))
    if rounds:
        prev = set(json.load(open(os.path.join(repo, rounds[-1]))))
        try:
            cur = set(json.load(open(f"{outdir}/query_names.json")))
        except Exception:
            cur = {d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d))}
        lost = sorted(prev - cur)
        if lost:
            print(f"COVERAGE SHRANK vs {rounds[-1]}: lost {len(lost)}: "
                  + ", ".join(lost))
            failures += len(lost)
        else:
            print(f"coverage ⊇ {rounds[-1]} ({len(prev)} prior, {len(cur)} now)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
