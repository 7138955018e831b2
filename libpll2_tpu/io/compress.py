"""Alignment column (site-pattern) compression.

Deduplicates identical alignment columns before partition creation,
returning per-pattern weights and optionally the site->pattern back-map
(reference: /root/reference/src/compress.c:137-412). Semantics match the
reference exactly:

  * columns are compared by their charmap-encoded state codes, so case and
    ambiguity synonyms ('U' vs 'T') merge;
  * unique patterns come out in lexicographic column order (the reference
    radix-quicksorts columns and keeps sorted order);
  * compressed sequences are re-decoded through the inverse charmap, where
    the highest ASCII character mapping to a state code is its
    representative (compress.c builds inv_charmap by ascending scan, last
    one wins);
  * illegal characters raise (PLL_ERROR_TIPDATA_ILLEGALSTATE).

The O(L log L) column sort is numpy C code (np.unique over the transposed
code matrix) — the TPU-native replacement for the reference's hand-written
3-way radix quicksort (compress.c:40-97).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .. import constants as C


def encode_msa(sequences: Sequence[str], charmap: np.ndarray) -> np.ndarray:
    """[count, length] uint64 state-code matrix; raises on illegal chars."""
    count = len(sequences)
    length = len(sequences[0])
    codes = np.empty((count, length), dtype=np.uint64)
    cm = np.asarray(charmap, dtype=np.uint64)
    for i, seq in enumerate(sequences):
        if len(seq) != length:
            raise C.PllError(C.ERROR_FASTA_NONALIGNED,
                             "sequences are not aligned")
        row = cm[np.frombuffer(seq.encode("ascii"), dtype=np.uint8)]
        if np.any(row == 0):
            bad = seq[int(np.argmax(row == 0))]
            raise C.PllError(C.ERROR_TIPDATA_ILLEGALSTATE,
                             f"Illegal state code \"{bad}\"")
        codes[i] = row
    return codes


def inverse_charmap(charmap: np.ndarray) -> dict:
    """state code -> representative character (last ASCII wins,
    compress.c:99-135)."""
    inv = {}
    for i in range(256):
        code = int(charmap[i])
        if code:
            inv[code] = chr(i)
    return inv


def compress_site_patterns(sequences: Sequence[str],
                           charmap: np.ndarray,
                           return_map: bool = False
                           ) -> Tuple[List[str], np.ndarray,
                                      Optional[np.ndarray]]:
    """Returns (compressed_sequences, pattern_weights[, site_pattern_map]).

    site_pattern_map[site] = index of the pattern representing that site
    (pll_compress_site_patterns_msa, compress.c:403-412).
    """
    codes = encode_msa(sequences, charmap)              # [count, L]
    cols = codes.T                                      # [L, count]
    uniq, inverse, counts = np.unique(
        cols, axis=0, return_inverse=True, return_counts=True)
    inverse = inverse.reshape(-1)

    inv_map = inverse_charmap(np.asarray(charmap, dtype=np.uint64))
    decode = np.zeros(int(max(inv_map)) + 1, dtype='<U1')
    for code, ch in inv_map.items():
        decode[code] = ch
    comp_cols = decode[uniq.astype(np.int64)]           # [P, count] chars
    compressed = ["".join(comp_cols[:, j]) for j in range(cols.shape[1])]

    weights = counts.astype(np.int64)
    if return_map:
        return compressed, weights, inverse.astype(np.int64)
    return compressed, weights, None
