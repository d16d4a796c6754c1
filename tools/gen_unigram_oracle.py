#!/usr/bin/env python3
"""Independent unigram-LM tokenizer oracle generator for the t34/t35
gates.

Re-implements, from the published algorithm (Kudo, "Subword
Regularization", ACL 2018, with hard-Viterbi EM as the paper's noted
decoding approximation), unigram vocabulary induction and
segmentation, sharing no code with the engine
(src/main/scala/graft/ext/Unigram.scala + functions.UnigramTokenize —
pure Python big-ints vs codegen'd Java BigInteger), so agreement pins
both against the algorithm rather than the engine against itself.

Conventions mirrored from the engine (see Unigram.scala scaladoc):
  - words: split on ASCII whitespace (Java's \\s), case preserved,
    empties dropped; substrings by code point
  - seed: all substrings of length 1..max_piece_len of the word-type
    table, weighted by word frequency per occurrence; vocabulary =
    every single character + top seed_size multi-char pieces by
    (count desc, piece asc)
  - hard EM: Viterbi best segmentation per word type under
    p(piece) = count/total, compared EXACTLY via cross-multiplied
    integers (prodA*T^kB vs prodB*T^kA); ties prefer fewer pieces then
    the lexicographically smaller piece sequence; unknown single chars
    act as count 1; M-step re-counts with integer word frequencies,
    multi-char pieces with zero count drop, current single chars floor
    at 1
  - prune (when above vocab_size after em_iters iterations): keep all
    single chars + top multi-char pieces down to
    max(vocab_size, 3*|vocab|//4) pieces; stop at vocab_size or when
    pruning no longer shrinks

Output: two DuckDB oracle queries with pinned VALUES literals over the
FIXED sf0.01 corpus — the final vocabulary (piece, n) and per-document
token counts. Regenerate if the driver's corpus generator changes.

Usage: python3 tools/gen_unigram_oracle.py [sf_dir]
"""
import re
import sys

import pandas as pd

VOCAB_SIZE = 45
MAX_PIECE_LEN = 6
SEED_SIZE = 800
EM_ITERS = 2
WS = re.compile(r"[ \t\n\r\f\x0b]+")


def words_of(text):
    return [w for w in WS.split(text) if w]


def viterbi(word, counts, total, maxlen):
    n = len(word)
    best = [None] * (n + 1)  # (prod, k, path)
    best[0] = (1, 0, [])
    for j in range(1, n + 1):
        for i in range(max(0, j - maxlen), j):
            piece = word[i:j]
            c = counts.get(piece)
            if c is None:
                if j - i == 1:
                    c = 1
                else:
                    continue
            if best[i] is None:
                continue
            cp = best[i][0] * c
            ck = best[i][1] + 1
            cpath = best[i][2] + [piece]
            cur = best[j]
            if cur is None:
                best[j] = (cp, ck, cpath)
                continue
            lhs = cp * total ** cur[1]
            rhs = cur[0] * total ** ck
            if lhs != rhs:
                better = lhs > rhs
            elif ck != cur[1]:
                better = ck < cur[1]
            else:
                better = cpath < cur[2]
            if better:
                best[j] = (cp, ck, cpath)
    return best[n][2]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]

    wc = {}
    for t in docs["text"]:
        for w in words_of(t):
            wc[w] = wc.get(w, 0) + 1

    # ---- seed
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

    def sq(x):
        return "'" + x.replace("'", "''") + "'"

    rows = ",".join(f"({sq(p)},{c})" for p, c in sorted(counts.items()))
    print("-- t34_unigram_vocab oracle")
    print("SELECT * FROM (VALUES " + rows +
          ") AS t(piece, n) ORDER BY piece")
    print()

    total = sum(counts.values())
    memo = {}

    def n_tokens(text):
        out = 0
        for w in words_of(text):
            if w not in memo:
                memo[w] = len(viterbi(w, counts, total, MAX_PIECE_LEN))
            out += memo[w]
        return out

    tok = ",".join(
        f"({int(r.doc_id)},{n_tokens(r.text)})" for r in docs.itertuples())
    print("-- t35_unigram_token_counts oracle")
    print("SELECT * FROM (VALUES " + tok +
          ") AS t(doc_id, n_tokens) ORDER BY doc_id")


if __name__ == "__main__":
    main()
