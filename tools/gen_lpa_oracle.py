#!/usr/bin/env python3
"""Independent label-propagation oracle generator for the g5 gate.

Re-implements, from the published definition (Raghavan, Albert, Kumara,
"Near linear time algorithm to detect community structures in
large-scale networks", Phys. Rev. E 2007 — the deterministic
SYNCHRONOUS variant with min-label tie-break), community detection over
the same co-purchase graph the g1/g4 gates use, sharing no code with
the engine (pure Python dict rounds vs the DataFrame loop in
src/main/scala/graft/ext/Graphs.scala labelPropagation).

Output: a DuckDB oracle query with the (label, member count, member-id
sum) rows as a pinned VALUES literal over the FIXED sf0.01 corpus (the
driver's gate scale). Regenerate if the corpus generator changes.

Usage: python3 tools/gen_lpa_oracle.py [sf_dir] [iters]
"""
import sys
from collections import Counter, defaultdict

import duckdb


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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

    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n, nbrs in adj.items():
            votes = Counter(labels[b] for b in nbrs)
            best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new

    agg = defaultdict(lambda: [0, 0])
    for n, l in labels.items():
        agg[l][0] += 1
        agg[l][1] += n
    rows = sorted((l, c, s) for l, (c, s) in agg.items())

    values = ",".join(f"({l},{c},{s})" for l, c, s in rows)
    print(f"found {len(rows)} communities over {len(labels)} nodes",
          file=sys.stderr)
    print('"""SELECT * FROM (VALUES ' + values
          + ') AS t(lbl, n_members, sum_nodes) ORDER BY lbl"""')


if __name__ == "__main__":
    main()
