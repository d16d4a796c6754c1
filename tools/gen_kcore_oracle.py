#!/usr/bin/env python3
"""Independent k-core oracle generator for the g4 gate.

Re-implements, from the published definition (Seidman, "Network
structure and minimum degree", Social Networks 1983), iterative-peel
k-core decomposition over the same co-purchase graph the g1 triangle
gate uses (nodes = parts, edges = parts sharing an order), sharing no
code with the engine (pure Python dict peel vs the DataFrame fixpoint
in src/main/scala/graft/ext/Graphs.scala kCore).

Output: a DuckDB oracle query with the (node, in-core degree) rows as
a pinned VALUES literal over the FIXED sf0.01 corpus (the driver's
gate scale) — the peel itself is iterative and not SQL-expressible.
Regenerate if the driver's corpus generator changes.

Usage: python3 tools/gen_kcore_oracle.py [sf_dir] [k]
"""
import sys
from collections import defaultdict

import duckdb

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    edges = duckdb.sql(f"""
        WITH gi AS (
          SELECT DISTINCT l_orderkey AS g, l_partkey AS i
          FROM '{sf_dir}/lineitem.parquet'),
        e AS (
          SELECT DISTINCT a.i AS u, b.i AS v
          FROM gi a JOIN gi b USING (g) WHERE a.i < b.i)
        SELECT u, v FROM e""").fetchall()

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)

    changed = True
    while changed:
        changed = False
        for node in list(adj.keys()):
            if len(adj[node]) < k:
                for nb in adj[node]:
                    adj[nb].discard(node)
                del adj[node]
                changed = True

    rows = sorted((n, len(nbrs)) for n, nbrs in adj.items())
    print(f"-- g4_kcore oracle (k={k}, {len(rows)} core nodes, "
          f"{len(edges)} input edges)")
    vals = ",".join(f"({n},{d})" for n, d in rows)
    print("SELECT * FROM (VALUES " + vals +
          ") AS t(node, degree) ORDER BY node")


if __name__ == "__main__":
    main()
