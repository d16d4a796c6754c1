#!/usr/bin/env python3
"""Independent oracle generator for the t52 SFT token-span gate.

Replays, sharing no code with the engine, the whole t52 chain:
  1. BPE merge learning exactly as tools/gen_bpe_oracle.py (Sennrich
     et al., ACL 2016 — 24 merges, min_count 2, lexicographic tiebreak)
     over the FIXED sf0.01 corpus;
  2. the t52 gate's prompt/response split: prompt = first 5
     whitespace words joined by single spaces, response = one leading
     space + the remaining words (empty when the doc has <= 5 words) —
     a WORD-BOUNDARY split, the convention that makes head/tail
     tokenization equal whole-string tokenization;
  3. the SFT template of TextAnalysis.renderSftTokens:
     head = '<|system|>You are a helpful assistant.<|user|>' + prompt
            + '<|assistant|>'
     tail = response + '<|end|>'
  4. per doc: loss_start_tok = |BPE(head)| + 1,
     loss_end_tok = |BPE(head)| + |BPE(tail)| + 1,
     n_tokens = |BPE(head)| + |BPE(tail)|.

Output: one DuckDB VALUES-literal oracle query. Regenerate if the
driver's corpus generator changes.

Usage: python3 tools/gen_sft_token_oracle.py [sf_dir]
"""
import re
import sys

import pandas as pd

NUM_MERGES = 24
MIN_COUNT = 2
WS = re.compile(r"[ \t\n\r\f\x0b]+")

SYS = "<|system|>You are a helpful assistant.<|user|>"
ASST = "<|assistant|>"
END = "<|end|>"


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


def learn_merges(texts):
    counts = {}
    for t in texts:
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    merges = learn_merges(docs["text"])

    def n_tokens(text):
        out = 0
        for w in words_of(text):
            syms = init_syms(w)
            for l, r in merges:
                syms = merge_seq(syms, l, r)
            out += len(syms)
        return out

    rows = []
    for r in docs.itertuples():
        w = words_of(r.text)
        prompt = " ".join(w[:5])
        response = (" " + " ".join(w[5:])) if w[5:] else ""
        head = SYS + prompt + ASST
        tail = response + END
        nh = n_tokens(head)
        nt = n_tokens(tail)
        rows.append((int(r.doc_id), nh + 1, nh + nt + 1, nh + nt))

    vals = ",".join(f"({d},{s},{e},{n})" for d, s, e, n in rows)
    print("-- t52_sft_token_spans oracle")
    print("SELECT * FROM (VALUES " + vals +
          ") AS t(doc_id, loss_start_tok, loss_end_tok, n_tokens)"
          " ORDER BY doc_id")
    print()

    # t53: DPO pair token spans — chosen = the word-boundary response,
    # rejected = the same words reversed (t50's deterministic corruption),
    # both with their leading space; head tokenized once and shared.
    drows = []
    for r in docs.itertuples():
        w = words_of(r.text)
        prompt = " ".join(w[:5])
        rest = w[5:]
        chosen = (" " + " ".join(rest)) if rest else ""
        rejected = (" " + " ".join(reversed(rest))) if rest else ""
        head = SYS + prompt + ASST
        nh = n_tokens(head)
        nc = n_tokens(chosen + END)
        nr = n_tokens(rejected + END)
        drows.append((int(r.doc_id), nh + 1, nh + nc + 1, nh + nr + 1))
    dvals = ",".join(f"({d},{s},{c},{j})" for d, s, c, j in drows)
    print("-- t53_dpo_token_spans oracle")
    print("SELECT * FROM (VALUES " + dvals +
          ") AS t(doc_id, loss_start_tok, chosen_loss_end_tok,"
          " rejected_loss_end_tok) ORDER BY doc_id")


if __name__ == "__main__":
    main()
