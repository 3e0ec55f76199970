#!/usr/bin/env python3
"""Invariant/derivation parity for the cluster-chain sf1 oracle
exclusions (r16 verdict #5).

The excluded oracles that time out at sf1 do so REPLAYING the
min-label fixpoint CTE chain, not checking the answer. This tool
checks the answers in O(E)/O(n) DuckDB work instead:

  1. MAP VALIDITY — the dumped cluster map (d_dup_clusters) against
     the dumped F7 edge relation (d_lsh_jaccard):
       I1  every edge's endpoints carry the same label
       I2  every label <= its doc_id
       I3  every label is self-rooted (label(label) = label)
       I4  every edge endpoint is present in the map
       I5  every edge-free doc labels itself
     I1 proves label classes are UNIONS of connected components; I2+I3
     prove each class's label is its minimum member; I5 pins the
     singleton side. (The one case this cannot exclude in O(E) is a
     class that is a union of >=2 multi-doc components sharing the
     global min's label — the full closure is exactly what the timed-
     out oracle replays, and the same map logic is closure-verified by
     DuckDB recursion at sf0.001/0.01/0.1 and by GraphX cross-check.)
  2. INCR ≡ BATCH — d_incr_clusters must equal d_dup_clusters row for
     row (their oracles share the same final fixpoint CTE).
  3. DERIVATIONS — for every excluded oracle embedding the chain, run
     the oracle SQL with the fixpoint chain SUBSTITUTED by the
     validated dumped map, and compare against the Spark dump with
     parity.py's exact column/type/row compare. This is full value
     parity on everything downstream of the map.
  4. q_report_components — I1-I5 over the report-edge relation
     (computed directly; it is linear in events).

Usage: python3 tools/sf1_invariants.py <sfDir> <verifyOutDir>
Exit 0 iff every check passes.
"""
import glob
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import parity  # noqa: E402  (table/type_sig compare helpers)

# the report-edge relation (mirrors operators/Graph.scala edgesSql)
REPORT_EDGES = """
SELECT DISTINCT user_id AS src, CAST(props->>'k' AS BIGINT) AS dst
FROM events
WHERE CAST(props->>'k' AS BIGINT) IS NOT NULL
  AND user_id <> CAST(props->>'k' AS BIGINT)"""


def dump_view(con, out_dir, name, view):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        raise RuntimeError(f"no spark dump for {name} under {out_dir}")
    con.execute(
        f"CREATE OR REPLACE VIEW {view} AS "
        f"SELECT * FROM read_parquet({files!r})")


def zero_check(con, label, sql, fails):
    n = con.execute(sql).fetchone()[0]
    if n == 0:
        print(f"ok   {label}")
    else:
        print(f"FAIL {label}: {n} violating rows")
        fails.append(label)


def compare_derivation(con, name, sql, out_dir, fails):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark dump")
        fails.append(name)
        return
    t0 = time.monotonic()
    got = con.sql(f"SELECT * FROM read_parquet({files!r})")
    gcols, grows = got.columns, got.fetchall()
    try:
        exp = con.sql(sql)
        ecols, erows = exp.columns, exp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: substituted oracle error: {e}")
        fails.append(name)
        return
    dt = time.monotonic() - t0
    gc, gr = parity.table(grows, gcols)
    ec, er = parity.table(erows, ecols)
    gsig = parity.type_sig(gcols, got.types)
    esig = parity.type_sig(ecols, exp.types)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}")
    elif gsig != esig:
        diff = [(a, b) for a, b in zip(gsig, esig) if a != b]
        print(f"TYPEFAIL {name}: spark={diff[0][0]} oracle={diff[0][1]}")
    elif len(gr) != len(er):
        print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
    else:
        bad = [(a, b) for a, b in zip(gr, er) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(gr)} mismatched rows; "
                  f"first: spark={bad[0][0]} oracle={bad[0][1]}")
        else:
            print(f"ok   {name} (map-substituted derivation, "
                  f"{len(gr)} rows, {dt:.1f}s)")
            return
    fails.append(name)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    fails = []

    # -- extract the fixpoint chain verbatim from d_dup_clusters' oracle
    dc = oracles["d_dup_clusters"]
    marker = "\nSELECT doc_id, label AS cluster_id FROM l"
    tail = dc.rindex(marker)
    chain = dc[len("WITH "):tail]
    rest = dc[tail + len(marker):]
    lname = "l" + rest.split("\n")[0].strip()
    sub = f"{lname} AS (SELECT doc_id, cluster_id AS label FROM cmap)"

    # -- 1. map validity against the dumped F7 edges
    dump_view(con, out_dir, "d_dup_clusters", "cmap")
    dump_view(con, out_dir, "d_lsh_jaccard", "f7")
    zero_check(con, "cluster_map I1 edge endpoints share a label",
               """SELECT count(*) FROM f7 e
                  JOIN cmap a ON a.doc_id = e.doc_a
                  JOIN cmap b ON b.doc_id = e.doc_b
                  WHERE a.cluster_id <> b.cluster_id""", fails)
    zero_check(con, "cluster_map I2 label <= doc_id",
               "SELECT count(*) FROM cmap WHERE cluster_id > doc_id",
               fails)
    zero_check(con, "cluster_map I3 labels self-rooted",
               """SELECT count(*) FROM (SELECT DISTINCT cluster_id c
                    FROM cmap) x
                  LEFT JOIN cmap m
                    ON m.doc_id = x.c AND m.cluster_id = x.c
                  WHERE m.doc_id IS NULL""", fails)
    zero_check(con, "cluster_map I4 edge endpoints mapped",
               """SELECT count(*) FROM (SELECT doc_a d FROM f7
                    UNION SELECT doc_b FROM f7) e
                  LEFT JOIN cmap m ON m.doc_id = e.d
                  WHERE m.doc_id IS NULL""", fails)
    zero_check(con, "cluster_map I5 edge-free docs label themselves",
               """SELECT count(*) FROM cmap m
                  LEFT JOIN (SELECT doc_a d FROM f7
                    UNION SELECT doc_b FROM f7) e ON e.d = m.doc_id
                  WHERE e.d IS NULL AND m.cluster_id <> m.doc_id""",
               fails)

    # -- 2. incremental map == batch map
    dump_view(con, out_dir, "d_incr_clusters", "icmap")
    zero_check(con, "d_incr_clusters ≡ d_dup_clusters (row-for-row)",
               """SELECT count(*) FROM (
                    (SELECT * FROM icmap EXCEPT SELECT * FROM cmap)
                    UNION ALL
                    (SELECT * FROM cmap EXCEPT SELECT * FROM icmap))""",
               fails)

    # -- 3. chain consumers: substituted-derivation full parity
    for name, sql in sorted(oracles.items()):
        if name in ("d_dup_clusters", "d_incr_clusters"):
            continue
        if chain in sql:
            compare_derivation(con, name, sql.replace(chain, sub),
                               out_dir, fails)

    # -- 4. q_report_components invariants over direct report edges
    con.execute("CREATE OR REPLACE VIEW redges AS "
                f"SELECT least(src, dst) a, greatest(src, dst) b "
                f"FROM ({REPORT_EDGES}) GROUP BY 1, 2")
    dump_view(con, out_dir, "q_report_components", "rcomp")
    zero_check(con, "report_components I1 edge endpoints share a label",
               """SELECT count(*) FROM redges e
                  JOIN rcomp x ON x.player_id = e.a
                  JOIN rcomp y ON y.player_id = e.b
                  WHERE x.component_id <> y.component_id""", fails)
    zero_check(con, "report_components I2 label <= player_id",
               "SELECT count(*) FROM rcomp WHERE component_id > player_id",
               fails)
    zero_check(con, "report_components I3 labels self-rooted",
               """SELECT count(*) FROM (SELECT DISTINCT component_id c
                    FROM rcomp) x
                  LEFT JOIN rcomp m
                    ON m.player_id = x.c AND m.component_id = x.c
                  WHERE m.player_id IS NULL""", fails)
    zero_check(con, "report_components I4 node set == edge endpoints",
               """SELECT count(*) FROM (
                    (SELECT player_id FROM rcomp
                     EXCEPT SELECT a FROM (SELECT a FROM redges
                       UNION SELECT b FROM redges) t(a))
                    UNION ALL
                    (SELECT a FROM (SELECT a FROM redges
                       UNION SELECT b FROM redges) t(a)
                     EXCEPT SELECT player_id FROM rcomp))""", fails)

    if fails:
        print(f"== INVARIANTS: {len(fails)} FAILED: {fails}")
        sys.exit(1)
    print("== INVARIANTS: all checks green")


if __name__ == "__main__":
    main()
