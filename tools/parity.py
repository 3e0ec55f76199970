#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and compare (schema, rows, values).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

PARITY_HOIST=1 turns on CTE HOISTING: a top-level non-recursive
`WITH a AS (...), b AS (...) SELECT ...` oracle is executed as
CREATE TEMP TABLE a AS ...; CREATE TEMP TABLE b AS ...; SELECT ... —
semantics-preserving by SQL's own CTE rules (each CTE sees only
earlier names; a CTE shadowing a base view shadows it either way),
but it hands DuckDB REAL cardinalities where the single-statement
plan only has estimates. Measured on d_lsh_jaccard at sf0.1 the
single-statement plan builds an 83M-row hash table off a 156-row
estimate (27s -> >1800s at sf1); hoisted, the same oracle runs the
same joins build-side-correct in ~4s. Used by tools/sf1_parity.sh
for the sf1 evidence sweep; every hoisted query is cross-validated
green under the DEFAULT single-statement path at sf0.001/0.01/0.1
(the driver's own gate always runs single-statement).
"""
import glob
import json
import math
import os
import re
import sys
import time

import duckdb


def split_ctes(sql):
    """Parse a top-level `WITH a AS (...), b AS (...) SELECT ...` into
    ([(name, body), ...], final_select), or None when the statement is
    not that shape (no top-level WITH, or WITH RECURSIVE — a recursive
    chain cannot be hoisted). Quote-aware paren matching; nested WITHs
    inside a CTE body stay inside that body's statement.
    """
    s = sql.lstrip()
    m = re.match(r"(?is)^WITH\s+", s)
    if not m or re.match(r"(?is)^WITH\s+RECURSIVE\b", s):
        return None
    i = m.end()
    ctes = []
    n = len(s)
    # `--` line comments may sit between CTEs (and inside bodies);
    # skip them wherever the parser expects structure, and treat them
    # as opaque in the paren scanner (a paren inside a comment must
    # not count)
    ws = r"(?:\s|--[^\n]*(?:\n|$))*"
    while True:
        # `AS MATERIALIZED (` parses too — a temp table IS the
        # materialization, so the hint is simply absorbed
        m = re.match(
            rf"(?is){ws}([A-Za-z_][A-Za-z0-9_]*){ws}AS"
            rf"(?:{ws}MATERIALIZED)?{ws}\(", s[i:])
        if not m:
            return None
        name = m.group(1)
        j = i + m.end()
        depth, k, quote = 1, j, None
        while k < n and depth:
            c = s[k]
            if quote:
                if c == quote:
                    quote = None
            elif c in ("'", '"'):
                quote = c
            elif c == "-" and s[k:k + 2] == "--":
                nl = s.find("\n", k)
                k = (nl if nl != -1 else n - 1)
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth:
            return None
        ctes.append((name, s[j:k - 1]))
        m2 = re.match(rf"(?s){ws},", s[k:])
        if m2:
            i = k + m2.end()
        else:
            return ctes, s[k:].strip()


def run_hoisted(con, sql):
    """Execute `sql` with its top-level CTEs hoisted to temp tables.
    Returns a relation for the final select, plus the temp names to
    drop after the result is consumed; None if not hoistable.
    """
    parsed = split_ctes(sql)
    if not parsed:
        return None
    ctes, final = parsed
    made = []
    try:
        for name, body in ctes:
            # plain CREATE (no OR REPLACE): a duplicate CTE name is a
            # binder error in the single-statement gate, and the hoisted
            # evidence path must reject exactly the same oracle text
            # rather than silently taking last-definition-wins (r17
            # advice). Names never collide ACROSS queries: every path
            # drops its temps after the result is consumed.
            con.execute(f'CREATE TEMP TABLE "{name}" AS {body}')
            made.append(name)
        return con.sql(final), made
    except Exception:
        for name in made:
            con.execute(f'DROP TABLE IF EXISTS "{name}"')
        raise


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    # Decimal → normalized string keeps scale visible but comparable
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def table(rows, cols):
    # sort columns by name (driver behavior), then rows
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in idx], out


def type_sig(cols, types):
    """Column-name → DuckDB type string, in sorted-column order.

    The driver's hash is TYPE-sensitive: an oracle whose aggregate comes
    back HUGEINT while Spark wrote int64 hash-mismatches even when every
    value is equal (round-10 `t_lm_score`). value-level compare via
    norm_cell() hides exactly that, so the signature is checked
    separately and strictly.
    """
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return [(cols[i], str(types[i]).upper()) for i in idx]


def compare_big(con, name, files, n_spark, got, ecols, etypes, dt):
    """In-DuckDB compare for multi-million-row results: the oracle has
    been materialized as temp table __exp; check columns, types, row
    count, then multiset equality via EXCEPT ALL in both directions.
    Returns True on ok (prints the same verdict lines as the small
    path).
    """
    gc = sorted(got.columns)
    ec = sorted(ecols)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}")
        return False
    gsig = type_sig(got.columns, got.types)
    esig = type_sig(ecols, etypes)
    if gsig != esig:
        diff = [(a, b) for a, b in zip(gsig, esig) if a != b]
        print(f"TYPEFAIL {name}: spark={diff[0][0]} oracle={diff[0][1]}"
              f" ({len(diff)} col(s) differ)")
        return False
    n_exp = con.execute("SELECT count(*) FROM __exp").fetchone()[0]
    if n_spark != n_exp:
        print(f"FAIL {name}: rows {n_spark} != {n_exp}")
        return False
    cols = ", ".join(f'"{c}"' for c in gc)
    t0 = time.monotonic()
    n_diff = con.execute(
        f"""SELECT count(*) FROM (
              (SELECT {cols} FROM read_parquet({files!r})
               EXCEPT ALL SELECT {cols} FROM __exp)
              UNION ALL
              (SELECT {cols} FROM __exp
               EXCEPT ALL SELECT {cols} FROM read_parquet({files!r})))"""
    ).fetchone()[0]
    if n_diff:
        print(f"FAIL {name}: {n_diff} row-multiset differences "
              f"(of {n_spark})")
        return False
    print(f"ok   {name} ({n_spark} rows, oracle {dt:.1f}s, "
          f"set-diff {time.monotonic() - t0:.1f}s)")
    return True


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    import os
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        # driver testdata is one flat file per table; ScaleGen output
        # (sf1) is a Spark-written DIRECTORY of part files
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    n_ok = n_bad = 0
    t_all = time.monotonic()
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet({files!r})")
        gcols = got.columns
        n_spark = con.execute(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        t0 = time.monotonic()
        hoist = os.environ.get("PARITY_HOIST") == "1"
        temp_names = []
        # MULTI-MILLION-ROW results (the pair relations at sf1) are
        # compared INSIDE DuckDB: fetching 10M tuples into Python and
        # sorting them there was the real cost of the "pair-mass"
        # sweep lines (d_minhash_lsh at sf1: oracle 36s, Python
        # compare 750s). Set-op semantics give the same multiset
        # verdict (DuckDB compares NULL and NaN equal in set ops),
        # and the strict type check still runs first, so the
        # value-normalization of the small path (Decimal→float, NaN
        # token) has nothing left to normalize.
        big = n_spark > int(os.environ.get("PARITY_BIG_ROWS", "1000000"))
        try:
            hoisted = run_hoisted(con, sql) if hoist else None
            if hoisted:
                exp, temp_names = hoisted
            else:
                exp = con.sql(sql)
            etypes, ecols = exp.types, exp.columns
            if big:
                exp.create("__exp")
                temp_names.append("__exp")
                erows = None
            else:
                erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            for t in temp_names:
                con.execute(f'DROP TABLE IF EXISTS "{t}"')
            continue
        dt = time.monotonic() - t0
        if big:
            ok = compare_big(con, name, files, n_spark,
                             got, ecols, etypes, dt)
            for t in temp_names:
                con.execute(f'DROP TABLE IF EXISTS "{t}"')
            if ok:
                n_ok += 1
            else:
                n_bad += 1
            continue
        for t in temp_names:
            con.execute(f'DROP TABLE IF EXISTS "{t}"')
        grows = got.fetchall()
        gc, gr = table(grows, gcols)
        ec, er = table(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_bad += 1
            continue
        gsig, esig = type_sig(gcols, got.types), type_sig(ecols, etypes)
        if gsig != esig:
            diff = [(a, b) for a, b in zip(gsig, esig) if a != b]
            print(f"TYPEFAIL {name}: spark={diff[0][0]} oracle={diff[0][1]}"
                  f" ({len(diff)} col(s) differ)")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            n_bad += 1
            continue
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gr)} mismatched rows; "
                  f"first: spark={bad[0][0]} oracle={bad[0][1]} cols={gc}")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(gr)} rows, oracle {dt:.1f}s)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail, "
          f"oracle sweep {time.monotonic() - t_all:.0f}s")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
