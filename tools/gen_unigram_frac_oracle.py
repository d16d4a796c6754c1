#!/usr/bin/env python3
"""Independent FRACTIONAL-alpha subword-sampling oracle for the t39 gate.

SentencePiece's published sampling default is alpha = 0.1 — not an
integer — so the engine expresses the exponent as a rational
alpha/alphaDen and samples over weights

    W_i = floor( (prod_i^alpha * T^(alpha*(kMax-k_i)))^(1/alphaDen) )

computed entirely in integers (floor alphaDen-th root by Newton
iteration). This tool replays that contract in pure Python big-ints —
training, n-best enumeration, weighting, XXH64 draw — sharing NO code
with the engine (tools may share code with other tools: training and
n-best come from the t37 generator, which itself re-derives them from
the published algorithm).

The floor on the root is the documented deviation from the real-valued
p^(a/b) distribution, sized by the ROOT's bit length (the alphaDen-th
root compresses an n-bit weight to ~n/alphaDen bits): short
high-frequency words get small-integer roots, where flooring distorts
candidate ratios at the percent level or collapses near-equal weights
to the same integer. Both sides compute the identical floor, so the
gate stays a hash gate, not a tolerance gate — see the
UnigramSampleTokenize scaladoc for the full fidelity contract.

Output: the t39 DuckDB oracle — corpus-wide sampled-token histogram
over the FIXED sf0.01 corpus (nbest=4, alpha=1/10, seed=42).

Usage: python3 tools/gen_unigram_frac_oracle.py [sf_dir]
"""
import sys

import pandas as pd

from gen_simhash_oracle import xxh64
from gen_unigram_oracle import MAX_PIECE_LEN, words_of
from gen_unigram_sample_oracle import nbest_segs, train

NBEST = 4
ALPHA_NUM = 1
ALPHA_DEN = 10
SEED = 42


def nth_root(x, n):
    """Floor integer n-th root by Newton from an over-estimate."""
    assert x >= 0 and n >= 1
    if n == 1 or x in (0, 1):
        return x
    r = 1 << ((x.bit_length() + n - 1) // n)
    while True:
        nxt = ((n - 1) * r + x // r ** (n - 1)) // n
        if nxt >= r:
            return r
        r = nxt


def sample_tokens(text, counts, total, memo):
    out = []
    wi = 0
    for w in words_of(text):
        if w not in memo:
            cs = nbest_segs(w, counts, total, MAX_PIECE_LEN, NBEST)
            kmax = max(k for (_, k, _) in cs)
            weights = [
                nth_root(prod ** ALPHA_NUM
                         * total ** (ALPHA_NUM * (kmax - k)), ALPHA_DEN)
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
    print("-- t39_unigram_frac oracle")
    print("SELECT * FROM (VALUES " + rows +
          ") AS t(token, n) ORDER BY token")


if __name__ == "__main__":
    main()
