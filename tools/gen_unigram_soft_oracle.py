#!/usr/bin/env python3
"""Independent SOFT-EM unigram oracle generator for the t36 gate.

Re-implements, from the published algorithm (Kudo, "Subword
Regularization", ACL 2018 — the FULL expectation step this time, not
the hard-Viterbi approximation of gen_unigram_oracle.py), unigram
vocabulary induction with forward-backward expected counts, sharing no
code with the engine (src/main/scala/graft/ext/Unigram.scala
trainSoft).

Soft-EM likelihoods are IEEE doubles, so unlike every integer-exact
oracle here the t36 gate is a TOLERANCE gate: the engine's scores must
match these pinned scores within 1e-6 (absolute), and the piece SET
must match exactly. Bit-reproducibility across the two implementations
comes from pinning the floating-point operation ORDER, mirrored from
the engine's scaladoc:

  - word types iterate in (freq desc, word asc) order, capped at
    max_word_types;
  - lattice spans iterate i ascending then j ascending; alpha forward
    in j order with the inner sum ascending in i; beta backward with
    the inner sum ascending in j;
  - each expected-count contribution is computed as
    ((freq * alpha[i]) * p) * beta[j]) / alpha[n] and accumulated in
    traversal order;
  - every piece total (normalizations) accumulates in piece-ASC order;
  - single chars floor at expected count 1e-12 after each E-step;
    multi-char pieces that gathered no mass drop;
  - prune keeps all single chars + top multi-char pieces by
    (count desc, piece asc) down to max(vocab_size, 3*|vocab|//4).

Output: the pinned (piece, score_e9) VALUES literal for
PinnedOracles.t36SoftVocab, score_e9 = round(score * 1e9) of the final
probability normalized over the surviving vocabulary. Regenerate if
the driver's corpus generator changes.

Usage: python3 tools/gen_unigram_soft_oracle.py [sf_dir]
"""
import re
import sys

import pandas as pd

VOCAB_SIZE = 45
MAX_PIECE_LEN = 6
SEED_SIZE = 800
EM_ITERS = 2
MAX_WORD_TYPES = 2000000
WS = re.compile(r"[ \t\n\r\f\x0b]+")


def words_of(text):
    return [w for w in WS.split(text) if w]


def total_of(m):
    t = 0.0
    for p in sorted(m):
        t += m[p]
    return t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]

    wc = {}
    for t in docs["text"]:
        for w in words_of(t):
            wc[w] = wc.get(w, 0) + 1
    table = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_WORD_TYPES]

    # ---- seed (identical structure to the hard trainer's)
    seed = {}
    for w, f in table:
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + MAX_PIECE_LEN) + 1):
                p = w[i:j]
                seed[p] = seed.get(p, 0) + f
    singles = {p: c for p, c in seed.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in seed.items() if len(p) > 1),
                    key=lambda kv: (-kv[1], kv[0]))[:SEED_SIZE]
    e = {p: float(c) for p, c in singles.items()}
    e.update({p: float(c) for p, c in multis})

    def soft_em(cur):
        total = total_of(cur)
        prob = {p: c / total for p, c in cur.items()}
        nxt = {}
        for w, f in table:
            n = len(w)
            fd = float(f)
            # span probs; 0.0 = out of vocab
            pij = {}
            for i in range(n):
                for j in range(i + 1, min(n, i + MAX_PIECE_LEN) + 1):
                    pp = prob.get(w[i:j])
                    if pp is not None:
                        pij[(i, j)] = pp
            alpha = [0.0] * (n + 1)
            alpha[0] = 1.0
            for j in range(1, n + 1):
                s = 0.0
                for i in range(max(0, j - MAX_PIECE_LEN), j):
                    p = pij.get((i, j))
                    if p:
                        s += alpha[i] * p
                alpha[j] = s
            z = alpha[n]
            if z <= 0.0:
                continue
            beta = [0.0] * (n + 1)
            beta[n] = 1.0
            for i in range(n - 1, -1, -1):
                s = 0.0
                for j in range(i + 1, min(n, i + MAX_PIECE_LEN) + 1):
                    p = pij.get((i, j))
                    if p:
                        s += p * beta[j]
                beta[i] = s
            for i in range(n):
                for j in range(i + 1, min(n, i + MAX_PIECE_LEN) + 1):
                    p = pij.get((i, j))
                    if p:
                        c = fd * alpha[i]
                        c = c * p
                        c = c * beta[j]
                        c = c / z
                        piece = w[i:j]
                        nxt[piece] = nxt.get(piece, 0.0) + c
        out = {p: c for p, c in nxt.items() if p in cur}
        for p in cur:
            if len(p) == 1:
                out[p] = max(out.get(p, 0.0), 1e-12)
        return out

    while True:
        for _ in range(EM_ITERS):
            e = soft_em(e)
        if len(e) <= VOCAB_SIZE:
            break
        s = {p: c for p, c in e.items() if len(p) == 1}
        m = sorted(((p, c) for p, c in e.items() if len(p) > 1),
                   key=lambda kv: (-kv[1], kv[0]))
        target = max(VOCAB_SIZE, len(e) * 3 // 4)
        keep_multi = max(0, target - len(s))
        pruned = dict(s)
        pruned.update(dict(m[:keep_multi]))
        stop = len(pruned) == len(e)
        e = pruned
        if stop:
            break

    total = total_of(e)

    def sq(x):
        return "'" + x.replace("'", "''") + "'"

    rows = ",".join(
        f"({sq(p)},{round(e[p] / total * 1e9)})" for p in sorted(e))
    print("-- PinnedOracles.t36SoftVocab (piece, score_e9)")
    print("Seq(" + ",".join(
        f"(\"{p}\", {round(e[p] / total * 1e9)}L)" for p in sorted(e)) + ")")
    print()
    print("-- t36 oracle SQL")
    print("SELECT piece, score_e9, TRUE AS within_tol FROM (VALUES " +
          rows + ") AS t(piece, score_e9) ORDER BY piece")


if __name__ == "__main__":
    main()
