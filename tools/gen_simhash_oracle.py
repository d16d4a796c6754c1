#!/usr/bin/env python3
"""Independent SimHash oracle generator for the d3_dedup_simhash gate.

Re-implements, from the public XXH64 spec (Collet, xxhash.h) and the
SimHash definition (Charikar 2002), the per-document 64-bit signature:
tokenize on ASCII whitespace over UTF-8 bytes, XXH64(token, seed=42)
per token, per-bit +/-1 occurrence-weighted vote, sign-fold.

This is a from-scratch replay sharing no code with the engine
(src/main/scala/graft/functions/Expressions.scala SimHashSignature) —
pure Python vs codegen'd Java — so agreement pins both against the
public algorithm specs rather than the engine against itself.

Output: a DuckDB oracle query with the per-doc signatures as a
VALUES literal over the FIXED sf0.01 corpus (the driver's gate scale).
Pair generation (xor + bit_count <= maxDist over all id_a < id_b) is
left to DuckDB SQL — all-pairs is the semantic contract; the engine's
pigeonhole chunk banding has exact recall at maxDist=3, so the sets
must match row-for-row.

Usage: python3 tools/gen_simhash_oracle.py [sf_dir]
Prints the oracle SQL to stdout (paste into ExtensionQueries).
"""
import sys

import pandas as pd

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def xxh64(data: bytes, seed: int = 0) -> int:
    """Pure-python XXH64 (xxhash.h spec)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed & MASK
        v4 = (seed - P1) & MASK
        def _round(acc, off):
            lane = int.from_bytes(data[off:off + 8], "little")
            return (_rotl((acc + lane * P2) & MASK, 31) * P1) & MASK

        while i + 32 <= n:
            v1 = _round(v1, i)
            v2 = _round(v2, i + 8)
            v3 = _round(v3, i + 16)
            v4 = _round(v4, i + 24)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & MASK, 31) * P1) & MASK
            h = (h * P1 + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((lane * P2) & MASK, 31) * P1) & MASK
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def is_space(b: int) -> bool:
    return b == 0x20 or 9 <= b <= 13


def simhash(text: str) -> int:
    """64-bit SimHash: whitespace tokens, xxh64 seed 42, +/-1 bit votes."""
    data = text.lower().encode("utf-8")
    votes = [0] * 64
    i, n = 0, len(data)
    while i < n:
        while i < n and is_space(data[i]):
            i += 1
        start = i
        while i < n and not is_space(data[i]):
            i += 1
        if i > start:
            h = xxh64(data[start:i], 42)
            for k in range(64):
                votes[k] += 1 if (h >> k) & 1 else -1
    sig = 0
    for k in range(64):
        if votes[k] > 0:
            sig |= 1 << k
    return sig


def signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    docs = pd.read_parquet(f"{sf}/documents.parquet")[["doc_id", "text"]]
    rows = [(int(r.doc_id), str(r.text)) for r in docs.itertuples()]
    # plantedDocs: corpus + near-identical copies of doc_id < 25.
    planted = rows + [(i + 100000, t + " zz") for i, t in rows if i < 25]
    vals = ",".join(f"({i},{signed(simhash(t))})" for i, t in sorted(planted))
    print(f"""WITH sigs(doc_id, sig) AS (VALUES {vals})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
 CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
ORDER BY id_a, id_b""")


if __name__ == "__main__":
    main()
