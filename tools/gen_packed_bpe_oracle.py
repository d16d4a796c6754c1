#!/usr/bin/env python3
"""Independent oracle generator for the pk7 packed-subword gate.

Replays, sharing no code with the engine, the tokenize->pack chain:
  1. BPE merge learning exactly as tools/gen_bpe_oracle.py (24 merges,
     min_count 2, lexicographic tiebreak) over the FULL fixed sf0.01
     corpus (the persisted-model contract: train once on everything,
     serve anywhere);
  2. tokenize the doc_id < 50 corpus SLICE with the learned merges
     (subword tokens, </w>-marked);
  3. concat-and-chunk pack (Packing.packSequences semantics): subword
     tokens laid end-to-end in doc_id order, cut every 256 tokens,
     last sequence short, zero-token docs dropped.

Output: one DuckDB VALUES-literal oracle query of
(seq_id, n_tokens, seq_text) with seq_text the space-joined subword
tokens in stream order. The slice bounds the literal (~40 KB).

Usage: python3 tools/gen_packed_bpe_oracle.py [sf_dir]
"""
import re
import sys

import pandas as pd

NUM_MERGES = 24
MIN_COUNT = 2
SEQ_LEN = 256
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

    def tokenize(text):
        out = []
        for w in words_of(text):
            syms = init_syms(w)
            for l, r in merges:
                syms = merge_seq(syms, l, r)
            out.extend(syms)
        return out

    stream = []
    sl = docs[docs.doc_id < 50].sort_values("doc_id")
    for r in sl.itertuples():
        stream.extend(tokenize(r.text))

    seqs = []
    for i in range(0, len(stream), SEQ_LEN):
        chunk = stream[i:i + SEQ_LEN]
        seqs.append((i // SEQ_LEN, len(chunk), " ".join(chunk)))

    def sq(s):
        return "'" + s.replace("'", "''") + "'"

    vals = ",".join(f"({i},{n},{sq(t)})" for i, n, t in seqs)
    print("-- pk7_packed_subwords oracle")
    print("SELECT * FROM (VALUES " + vals +
          ") AS t(seq_id, n_tokens, seq_text) ORDER BY seq_id")


if __name__ == "__main__":
    main()
