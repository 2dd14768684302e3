#!/usr/bin/env python3
"""Staged sf0.1 oracle for graph_wcc via the WCC certificate (r18 #1).

DuckDB's one-shot graph_wcc twin re-derives the full transitive closure
(`reach`), which is superlinear in component size — measured killed
after 240 s at sf0.1. This verifier instead checks the Spark-dumped
certificate `graph_wcc_cert` (node, comp, parent, depth) with LINEAR
property checks and then compares the component-size readout against
the dumped `graph_wcc` output.

The lemma (proved in graft.ext.Graph.wccCertificate's scaladoc): over
exactly the graph's node set,
  (1) comp(u) <= u,
  (2) depth=0 <=> parent IS NULL <=> comp=node,
  (3) every non-root's (node, parent) is a real edge with
      comp(parent)=comp(node) and depth(parent)=depth(node)-1,
  (4) every edge (u,v) has comp(u)=comp(v)
together force comp(u) = min(u's connected component). So a certificate
passing all checks plus the readout comparison IS a correctness proof
for graph_wcc — no closure required. The certificate's canonical
(parent, depth) form is additionally twin-verified at sf0.001/sf0.01 by
the driver gate (`graph_wcc_cert` oracle SQL).

Usage: python3 tools/oracle_wcc_staged.py <sf_dir> <verify_out_dir>
          [artifact_path]
Updates ORACLE_SF01.json: moves graph_wcc (and graph_wcc_cert) from
`deferred` to `results` on success.
"""
import glob
import json
import sys
import time

import duckdb


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    path = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_SF01.json"
    t0 = time.time()
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW lineitem AS
        SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')""")
    for name in ("graph_wcc_cert", "graph_wcc"):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL: no spark dump for {name} in {out_dir}")
            return 1
        con.execute(f"""CREATE VIEW {name} AS
            SELECT * FROM read_parquet({files!r})""")
    con.execute("""CREATE TABLE e AS
        WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                    FROM lineitem)
        SELECT DISTINCT a.pk AS src, b.pk AS dst
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk""")
    checks = {
        # coverage: certificate rows == graph node set, bijectively
        "coverage": """
            SELECT (SELECT count(*) FROM graph_wcc_cert)
                 = (SELECT count(DISTINCT src) FROM e)
               AND NOT EXISTS (SELECT 1 FROM graph_wcc_cert c
                               LEFT JOIN (SELECT DISTINCT src FROM e) n
                               ON c.node = n.src WHERE n.src IS NULL)
               AND NOT EXISTS (SELECT 1 FROM graph_wcc_cert
                               GROUP BY node HAVING count(*) > 1)""",
        # (1) comp <= node
        "min_bound": """
            SELECT NOT EXISTS (SELECT 1 FROM graph_wcc_cert
                               WHERE comp > node)""",
        # (2) root triple-equivalence
        "root_iff": """
            SELECT NOT EXISTS (SELECT 1 FROM graph_wcc_cert
                WHERE (depth = 0) <> (parent IS NULL)
                   OR (depth = 0) <> (comp = node))""",
        # (3) parent edge real, same comp, depth-1
        "parent_step": """
            SELECT NOT EXISTS (
                SELECT 1 FROM graph_wcc_cert c
                LEFT JOIN e ON e.src = c.node AND e.dst = c.parent
                LEFT JOIN graph_wcc_cert p ON p.node = c.parent
                WHERE c.parent IS NOT NULL
                  AND (e.src IS NULL OR p.node IS NULL
                       OR p.comp <> c.comp OR p.depth <> c.depth - 1))""",
        # (4) edge consistency
        "edge_consistent": """
            SELECT NOT EXISTS (
                SELECT 1 FROM e
                JOIN graph_wcc_cert cu ON cu.node = e.src
                JOIN graph_wcc_cert cv ON cv.node = e.dst
                WHERE cu.comp <> cv.comp)""",
        # readout: certificate roll-up == the dumped graph_wcc result
        "readout": """
            SELECT NOT EXISTS (
                SELECT comp AS component_id, count(*) AS n_nodes
                FROM graph_wcc_cert GROUP BY 1
                EXCEPT SELECT component_id, n_nodes FROM graph_wcc)
               AND NOT EXISTS (
                SELECT component_id, n_nodes FROM graph_wcc
                EXCEPT SELECT comp, count(*) FROM graph_wcc_cert
                       GROUP BY comp)""",
    }
    verdicts = {}
    ok = True
    for name, sql in checks.items():
        v = bool(con.execute(sql).fetchone()[0])
        verdicts[name] = v
        ok = ok and v
        print(f"{'PASS' if v else 'FAIL'} wcc-staged check: {name}")
    dt = round(time.time() - t0, 1)
    print(f"{'PASS' if ok else 'FAIL'} graph_wcc (staged certificate, "
          f"{dt}s)")
    art = json.load(open(path))
    note = ("staged certificate verification (tools/oracle_wcc_staged.py):"
            " linear property checks of the graph_wcc_cert spanning-forest"
            " witness prove comp = component minimum (lemma in"
            " Graph.wccCertificate scaladoc); canonical cert form"
            " twin-verified at sf0.001+sf0.01")
    for name in ("graph_wcc", "graph_wcc_cert"):
        art["results"][name] = {"pass": ok, "sec": dt, "staged": True,
                                "checks": verdicts, "note": note}
        if ok:
            art["deferred"].pop(name, None)
    art["n_pass"] = sum(1 for v in art["results"].values() if v["pass"])
    art["n_fail"] = sum(1 for v in art["results"].values()
                        if not v["pass"])
    art["recorded_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                        time.gmtime())
    with open(path, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"artifact: {art['n_pass']} pass, {art['n_fail']} fail, "
          f"{len(art['deferred'])} deferred")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
