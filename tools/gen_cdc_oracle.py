#!/usr/bin/env python3
"""Independent content-defined-chunking oracle generator for the d19 gate.

Re-implements, from the published definition (Xia et al., "FastCDC: a
Fast and Efficient Content-Defined Chunking Approach for Data
Deduplication", USENIX ATC 2016 — the gear-hash boundary family), the
chunk-overlap pair relation over the same planted corpus the gate
builds, sharing no code with the engine (pure Python byte loop vs the
codegen'd expression in
src/main/scala/graft/functions/Expressions.scala CdcChunks).

Gear table: 256 constants from the standard 64-bit avalanche mix, the
same published fmix64 constants the engine documents. Chunk rule: cut
after byte i when chunk >= minSize and gear hash masks to zero over
avgBits bits, or at maxSize; remainder is the last chunk. Fingerprint:
h = h*31 + signed_byte (64-bit wrap) seeded 1125899906842597.

Output: a DuckDB oracle query with the (id_a, id_b, shared_chunks,
shared_bytes) pairs as a pinned VALUES literal over the FIXED sf0.01
corpus. Regenerate if the corpus generator changes.

Usage: python3 tools/gen_cdc_oracle.py [sf_dir]
"""
import sys
from collections import defaultdict

import duckdb

M64 = (1 << 64) - 1


def avalanche(v):
    h = (v * 0x9E3779B97F4A7C15 + 0x2545F4914F6CDD1D) & M64
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & M64
    h ^= h >> 33
    return h


GEAR = [avalanche(i) for i in range(256)]


def chunks(data, avg_bits=6, min_size=16, max_size=256):
    """Yield (off, len, fp) per chunk."""
    avg_mask = (1 << avg_bits) - 1
    out = []
    s = 0
    h = 0
    for i, b in enumerate(data):
        h = ((h << 1) + GEAR[b]) & M64
        ln = i - s + 1
        if (ln >= min_size and (h & avg_mask) == 0) or ln >= max_size:
            out.append((s, ln, fingerprint(data, s, ln)))
            s = i + 1
            h = 0
    if s < len(data):
        out.append((s, len(data) - s, fingerprint(data, s, len(data) - s)))
    return out


def fingerprint(data, off, ln):
    fp = 1125899906842597
    for i in range(off, off + ln):
        b = data[i] if data[i] < 128 else data[i] - 256  # signed byte
        fp = (fp * 31 + b) & M64
    return fp


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'").fetchall()
    corpus = [(i, t) for i, t in rows]
    corpus += [(i + 300000, f"WRAP{i} {t} TAILTAILTAIL")
               for i, t in rows if i % 6 == 0]

    # (doc, fp) set semantics with max len, like the engine.
    doc_fp = {}
    for doc, text in corpus:
        for _, ln, fp in chunks(text.encode("utf-8")):
            key = (doc, fp)
            if key not in doc_fp or doc_fp[key] < ln:
                doc_fp[key] = ln

    by_fp = defaultdict(list)
    for (doc, fp), ln in doc_fp.items():
        by_fp[fp].append((doc, ln))

    pairs = defaultdict(lambda: [0, 0])
    for fp, docs in by_fp.items():
        if len(docs) < 2 or len(docs) > 4096:
            continue
        docs.sort()
        for i, (a, la) in enumerate(docs):
            for b, _ in docs[i + 1:]:
                pairs[(a, b)][0] += 1
                pairs[(a, b)][1] += la  # smaller-id side's len, as engine

    kept = sorted((a, b, c, s) for (a, b), (c, s) in pairs.items() if c >= 2)
    values = ",".join(f"({a},{b},{c},{s})" for a, b, c, s in kept)
    print(f"{len(kept)} pairs", file=sys.stderr)
    print('"""SELECT * FROM (VALUES ' + values
          + ') AS t(id_a, id_b, shared_chunks, shared_bytes) '
          + 'ORDER BY id_a, id_b"""')


if __name__ == "__main__":
    main()
