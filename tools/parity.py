#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracles and compare (schema, rows, values).

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import math
import sys
import time

import duckdb


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
        gcols, grows = got.columns, got.fetchall()
        t0 = time.monotonic()
        try:
            exp = con.sql(sql)
            ecols, erows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        dt = time.monotonic() - t0
        gc, gr = table(grows, gcols)
        ec, er = table(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_bad += 1
            continue
        gsig, esig = type_sig(gcols, got.types), type_sig(ecols, exp.types)
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
