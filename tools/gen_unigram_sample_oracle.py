#!/usr/bin/env python3
"""Independent subword-regularization sampling oracle for the t37 gate.

Re-implements, from the published algorithm (Kudo, "Subword
Regularization", ACL 2018 §3: sample a segmentation from the l-best
list with probability proportional to p(seg)^alpha) and the public
XXH64 spec, the engine's sampling serving pass
(functions.UnigramSampleTokenize) with pure Python big-ints and
Fractions — no shared code — so agreement pins both sides against the
algorithm.

Conventions mirrored from the engine (see UnigramSampleTokenize
scaladoc):
  - training: identical to tools/gen_unigram_oracle.py (words_of /
    viterbi are imported from it — the two TOOLS may share code; the
    engine may not) — 45-piece hard-EM vocabulary over the sf0.01
    corpus;
  - n-best: per-prefix top-n DP under the exact order (likelihood as a
    Fraction prod/T^k descending, then fewer pieces, then
    lexicographically smaller path); single-char UNK floor count 1;
  - weights: prod^alpha * T^(alpha*(kMax-k)) as exact ints, candidates
    best-first;
  - draw: r = XXH64(word_utf8, seed + occurrence_ordinal) mod sum,
    occurrence ordinal counted over non-empty words within the row;
    first candidate whose cumulative weight exceeds r wins.

Output: the t37 DuckDB oracle — the corpus-wide sampled-token
histogram as a pinned VALUES literal over the FIXED sf0.01 corpus
(nbest=4, alpha=1, seed=42). Regenerate if the corpus generator
changes.

Usage: python3 tools/gen_unigram_sample_oracle.py [sf_dir]
"""
import sys
from fractions import Fraction

import pandas as pd

from gen_simhash_oracle import xxh64
from gen_unigram_oracle import (EM_ITERS, MAX_PIECE_LEN, SEED_SIZE,
                                VOCAB_SIZE, viterbi, words_of)

NBEST = 4
ALPHA = 1
SEED = 42


def train(docs):
    """The t34 training replay (same conventions as gen_unigram_oracle)."""
    wc = {}
    for t in docs["text"]:
        for w in words_of(t):
            wc[w] = wc.get(w, 0) + 1
    seed = {}
    for w, f in wc.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + MAX_PIECE_LEN) + 1):
                p = w[i:j]
                seed[p] = seed.get(p, 0) + f
    singles = {p: c for p, c in seed.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in seed.items() if len(p) > 1),
                    key=lambda kv: (-kv[1], kv[0]))[:SEED_SIZE]
    counts = dict(singles)
    counts.update(dict(multis))

    def em(cur):
        total = sum(cur.values())
        nxt = {}
        for w, f in wc.items():
            for p in viterbi(w, cur, total, MAX_PIECE_LEN):
                nxt[p] = nxt.get(p, 0) + f
        out = {p: c for p, c in nxt.items() if p in cur}
        for p in cur:
            if len(p) == 1 and p not in out:
                out[p] = 1
        return out

    while True:
        for _ in range(EM_ITERS):
            counts = em(counts)
        if len(counts) <= VOCAB_SIZE:
            break
        s = {p: c for p, c in counts.items() if len(p) == 1}
        m = sorted(((p, c) for p, c in counts.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))
        target = max(VOCAB_SIZE, len(counts) * 3 // 4)
        keep_multi = max(0, target - len(s))
        pruned = dict(s)
        pruned.update(dict(m[:keep_multi]))
        stop = len(pruned) == len(counts)
        counts = pruned
        if stop:
            break
    return counts


def nbest_segs(word, counts, total, maxlen, n):
    """Exact n-best lattice DP: returns [(prod, k, path)] best-first."""
    ln = len(word)
    if ln == 0:
        return []
    cands = [None] * (ln + 1)
    cands[0] = [(1, 0, [])]
    for j in range(1, ln + 1):
        allc = []
        for i in range(max(0, j - maxlen), j):
            piece = word[i:j]
            c = counts.get(piece)
            if c is None:
                if j - i == 1:
                    c = 1
                else:
                    continue
            for (prod, k, path) in cands[i]:
                allc.append((prod * c, k + 1, path + [piece]))
        allc.sort(key=lambda t: (-Fraction(t[0], total ** t[1]), t[1], t[2]))
        cands[j] = allc[:n]
    return cands[ln]


def sample_tokens(text, counts, total, memo):
    out = []
    wi = 0
    for w in words_of(text):
        if w not in memo:
            cs = nbest_segs(w, counts, total, MAX_PIECE_LEN, NBEST)
            kmax = max(k for (_, k, _) in cs)
            weights = [prod ** ALPHA * total ** (ALPHA * (kmax - k))
                       for (prod, k, _) in cs]
            memo[w] = ([p for (_, _, p) in cs], weights, sum(weights))
        paths, weights, wsum = memo[w]
        chosen = 0
        if len(weights) > 1:
            r = xxh64(w.encode("utf-8"), (SEED + wi) & 0xFFFFFFFFFFFFFFFF) \
                % wsum
            cum = 0
            for ci, wt in enumerate(weights):
                cum += wt
                if cum > r:
                    chosen = ci
                    break
        out.extend(paths[chosen])
        wi += 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    counts = train(docs)
    total = sum(counts.values())

    hist = {}
    for t in docs["text"]:
        memo = {}
        for tok in sample_tokens(t, counts, total, memo):
            hist[tok] = hist.get(tok, 0) + 1

    def sq(x):
        return "'" + x.replace("'", "''") + "'"

    rows = ",".join(f"({sq(p)},{c})" for p, c in sorted(hist.items()))
    print("-- t37_unigram_sample oracle")
    print("SELECT * FROM (VALUES " + rows +
          ") AS t(token, n) ORDER BY token")


if __name__ == "__main__":
    main()
