"""2-bit DNA encoding.

The whole framework represents DNA as integer codes (A=0, C=1, G=2, T=3).
Numeric order equals lexicographic order, so sorting k-mer codes sorts the
corresponding strings — which is what makes the reference's sort+dedup
canonicalisation (ref: lib/DeNovoAssembler.cpp:62-71,192) reproducible on
integer arrays.

k-mers are packed big-endian: code(s) = sum_i base(s[i]) * 4**(k-1-i).
Consequently for a k-mer code c:
  * prefix (first k-1 chars)  = c >> 2
  * suffix (last  k-1 chars)  = c & (4**(k-1) - 1)
  * last char                 = c & 3
mirroring the string slicing in the reference dBG builder
(ref: lib/DeNovoAssembler.cpp:94-101).
"""

from __future__ import annotations

import numpy as np

BASES = "ACGT"
A, C, G, T = 0, 1, 2, 3

# 255 marks non-ACGT characters (e.g. N); callers decide how to handle them.
INVALID = 255

_ENC_LUT = np.full(256, INVALID, dtype=np.uint8)
for _i, _b in enumerate(BASES):
    _ENC_LUT[ord(_b)] = _i
    _ENC_LUT[ord(_b.lower())] = _i

_DEC_LUT = np.frombuffer(BASES.encode(), dtype=np.uint8)

_COMPLEMENT = np.array([T, G, C, A], dtype=np.uint8)


def encode_dna(seq: str | bytes) -> np.ndarray:
    """Encode an ASCII DNA string to uint8 codes (A=0,C=1,G=2,T=3, other=255)."""
    if isinstance(seq, str):
        seq = seq.encode()
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _ENC_LUT[raw]


def decode_dna(codes: np.ndarray) -> str:
    """Decode uint8 codes back to an ACGT string. Codes must be in 0..3."""
    codes = np.asarray(codes, dtype=np.uint8)
    if codes.size and codes.max() > 3:
        raise ValueError("decode_dna: codes outside 0..3 (invalid/N present?)")
    return _DEC_LUT[codes].tobytes().decode()


def complement(codes: np.ndarray) -> np.ndarray:
    return _COMPLEMENT[np.asarray(codes, dtype=np.uint8)]


def reverse_complement(codes: np.ndarray) -> np.ndarray:
    """Reverse complement of a code vector.

    The reference simulator emits read_2 as the reverse complement of read_1
    (ref: lib/GenerateReads.R:437-439); only read_1 feeds the assembler.
    """
    return complement(codes)[::-1]


def kmer_code(seq: str) -> int:
    """Big-endian integer code of a k-mer string (host-side helper)."""
    codes = encode_dna(seq)
    if codes.size and codes.max() > 3:
        raise ValueError(f"kmer_code: non-ACGT character in {seq!r}")
    val = 0
    for c in codes:
        val = (val << 2) | int(c)
    return val


def code_to_kmer(code: int, k: int) -> str:
    """Inverse of kmer_code."""
    chars = []
    for i in range(k):
        chars.append(BASES[(code >> (2 * (k - 1 - i))) & 3])
    return "".join(chars)


def kmer_codes_np(codes: np.ndarray, k: int) -> np.ndarray:
    """All rolling k-mer codes of a code vector (numpy host version).

    Returns int64 array of length len(codes)-k+1. Windows containing invalid
    bases get code -1.
    """
    codes = np.asarray(codes)
    n = codes.shape[0] - k + 1
    if n <= 0:
        return np.empty((0,), dtype=np.int64)
    valid = codes <= 3
    vals = codes.astype(np.int64)
    out = np.zeros(n, dtype=np.int64)
    ok = np.ones(n, dtype=bool)
    for i in range(k):
        out = (out << 2) | vals[i : i + n]
        ok &= valid[i : i + n]
    out[~ok] = -1
    return out


def pack_words_np(codes: np.ndarray, word_bases: int = 16) -> np.ndarray:
    """Pack 2-bit codes big-endian into uint32 words, zero-padding the tail.

    Shape [..., L] -> [..., ceil(L/word_bases)]. Two equal-length sequences are
    equal iff their packed words are equal; lexicographic comparison of equal
    length sequences equals big-endian word-tuple comparison.
    """
    codes = np.asarray(codes, dtype=np.uint64)
    L = codes.shape[-1]
    n_words = -(-L // word_bases)
    pad = n_words * word_bases - L
    if pad:
        pad_shape = codes.shape[:-1] + (pad,)
        codes = np.concatenate([codes, np.zeros(pad_shape, dtype=np.uint64)], axis=-1)
    codes = codes.reshape(codes.shape[:-1] + (n_words, word_bases))
    shifts = (2 * (word_bases - 1 - np.arange(word_bases))).astype(np.uint64)
    words = (codes << shifts).sum(axis=-1)
    return words.astype(np.uint32)
