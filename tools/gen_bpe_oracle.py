#!/usr/bin/env python3
"""Independent BPE oracle generator for the t23/t24 gates.

Re-implements, from the published algorithm (Sennrich, Haddow & Birch,
ACL 2016, fig. 1), word-frequency-table byte-pair-encoding merge
learning and tokenization, sharing no code with the engine
(src/main/scala/graft/ext/Bpe.scala + functions.BpeTokenize — pure
Python vs codegen'd Java), so agreement pins both against the paper
rather than the engine against itself.

Conventions mirrored from the engine (see Bpe.scala scaladoc):
  - words: split on ASCII whitespace (Java's \\s: [ \\t\\n\\r\\f\\x0b]),
    case preserved, empties dropped
  - initial symbols: code points + a final "</w>" end-of-word marker
  - merge: adjacent (left, right) replaced non-overlapping left-to-right
  - best pair: max weighted count, lexicographically smallest
    (left, right) tiebreak; stop below min_count=2
  - 24 merges; tokenization = merges applied in order per word

Output: two DuckDB oracle queries with pinned VALUES literals over the
FIXED sf0.01 corpus (the driver's gate scale) — merge table (rank,
left, right) and per-document BPE token counts. Regenerate if the
driver's corpus generator changes.

Usage: python3 tools/gen_bpe_oracle.py [sf_dir]
"""
import re
import sys

import pandas as pd

NUM_MERGES = 24
MIN_COUNT = 2
WS = re.compile(r"[ \t\n\r\f\x0b]+")


def words_of(text):
    return [w for w in WS.split(text) if w]


def init_syms(word):
    return [c for c in word] + ["</w>"]


def merge_seq(syms, left, right):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]

    counts = {}
    for t in docs["text"]:
        for w in words_of(t):
            counts[w] = counts.get(w, 0) + 1
    vocab = [(init_syms(w), n) for w, n in counts.items()]

    merges = []
    for _ in range(NUM_MERGES):
        pair_counts = {}
        for syms, n in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < MIN_COUNT:
            break
        left, right = best[0]
        merges.append((left, right))
        vocab = [(merge_seq(s, left, right), n) for s, n in vocab]

    def sq(s):
        return "'" + s.replace("'", "''") + "'"

    rows = ",".join(
        f"({i + 1},{sq(l)},{sq(r)})" for i, (l, r) in enumerate(merges))
    print("-- t23_bpe_merges oracle")
    print('SELECT * FROM (VALUES ' + rows +
          ') AS t(rank, "left", "right") ORDER BY rank')
    print()

    def tokenize(text):
        out = 0
        for w in words_of(text):
            syms = init_syms(w)
            for l, r in merges:
                syms = merge_seq(syms, l, r)
            out += len(syms)
        return out

    tok = ",".join(
        f"({int(r.doc_id)},{tokenize(r.text)})" for r in docs.itertuples())
    print("-- t24_bpe_token_counts oracle")
    print("SELECT * FROM (VALUES " + tok +
          ") AS t(doc_id, n_tokens) ORDER BY doc_id")


if __name__ == "__main__":
    main()
