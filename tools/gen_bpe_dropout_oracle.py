#!/usr/bin/env python3
"""Independent BPE-dropout oracle for the t38 gate.

Re-implements, from the published algorithm (Provilkov, Emelianenko &
Voita, "BPE-Dropout", ACL 2020: drop each merge site with probability
p during segmentation) and the public XXH64 spec, the engine's
dropout serving pass (functions.BpeDropoutTokenize) in pure Python —
no shared code — so agreement pins both sides against the algorithm.

Conventions mirrored from the engine (see BpeDropoutTokenize
scaladoc):
  - training: identical to tools/gen_bpe_oracle.py (imported — the two
    TOOLS may share code; the engine may not) — 24 merges over the
    sf0.01 corpus;
  - serving: merges applied in rank order, one left-to-right pass per
    merge; at each MATCHED site, coin = XXH64(word_utf8,
    (seed + wi*WI_MIX + mi*MI_MIX + site) mod 2^64) with wi the
    occurrence ordinal over non-empty words in the row, mi the merge
    rank (0-based), site the ordinal of matched sites within this
    pass; drop iff coin mod 1e6 < dropout_ppm; a dropped site emits
    the left symbol and advances one position (the right symbol stays
    mergeable later in the pass).

Output: the t38 DuckDB oracle — per-document dropout token counts as
a pinned VALUES literal over the FIXED sf0.01 corpus (p=0.1 i.e.
100000 ppm, seed=42). Regenerate if the corpus generator changes.

Usage: python3 tools/gen_bpe_dropout_oracle.py [sf_dir]
"""
import sys

import pandas as pd

from gen_bpe_oracle import (MIN_COUNT, NUM_MERGES, init_syms, merge_seq,
                            words_of)
from gen_simhash_oracle import xxh64

DROPOUT_PPM = 100000
SEED = 42
MASK = (1 << 64) - 1
WI_MIX = 0x9E3779B97F4A7C15
MI_MIX = 0xC2B2AE3D27D4EB4F


def learn_merges(docs):
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
    return merges


def dropout_merge_seq(syms, left, right, wbytes, wi, mi):
    out = []
    i = 0
    site = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            seed = (SEED + wi * WI_MIX + mi * MI_MIX + site) & MASK
            drop = xxh64(wbytes, seed) % 1000000 < DROPOUT_PPM
            site += 1
            if drop:
                out.append(syms[i])
                i += 1
            else:
                out.append(left + right)
                i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def n_tokens(text, merges):
    out = 0
    wi = 0
    for w in words_of(text):
        wbytes = w.encode("utf-8")
        syms = init_syms(w)
        for mi, (l, r) in enumerate(merges):
            syms = dropout_merge_seq(syms, l, r, wbytes, wi, mi)
        out += len(syms)
        wi += 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    merges = learn_merges(docs)

    tok = ",".join(
        f"({int(r.doc_id)},{n_tokens(r.text, merges)})"
        for r in docs.itertuples())
    print("-- t38_bpe_dropout oracle")
    print("SELECT * FROM (VALUES " + tok +
          ") AS t(doc_id, n_tokens) ORDER BY doc_id")


if __name__ == "__main__":
    main()
