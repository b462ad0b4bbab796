"""Batch span featurization for the Arrow scoring kernels.

The hashed-feature scoring kernels (``operators.classify``,
``operators.selection``) need, per document, the SAME feature sequence
the JVM featurizer produced at train time — lowercase-alnum word
tokens (plus space-joined k-grams for DSIR) or whitespace-collapsed
character n-grams — hashed with ``xxhash64``. Materializing those
features as Python strings would put a per-feature Python object on
the scoring hot path; instead every feature here is a **(start, len)
byte span over one canonical per-batch buffer**, which feeds
:func:`sparvi_core_spark.functions.xxh64np.xxh64_spans` directly.

Equivalence to the verified string twin (``classify._nb_featurizer``,
itself probed char-identical to the JVM featurizer):

- ``str.lower()`` runs on the unicode STRING (U+212A → 'k', İ's
  combining dot, etc. — byte-level lowercasing would differ), then the
  lowered string is UTF-8 encoded once per document.
- the ``[^a-z0-9]+`` ASCII split is performed on the BYTES: UTF-8
  multi-byte sequences use only bytes ≥ 0x80, so no continuation byte
  can fall in the ``[0-9a-z]`` range — maximal runs of alnum BYTES are
  exactly the twin's maximal runs of alnum CHARS, encoded.
- word k-grams are spans over a canonical space-joined token buffer
  (one scatter-gather per batch), so ``"t1 t2"`` is a contiguous slice
  even when the source text separated the tokens with other bytes.
- char n-grams are spans over the whitespace-collapsed lowered text's
  UTF-8 bytes, with per-CODEPOINT byte offsets derived from the
  codepoint values (UTF-8 length is a pure function of the codepoint),
  so an n-gram of n codepoints is one contiguous byte slice.
"""

from __future__ import annotations

import re

import numpy as np

_WS = re.compile(r"\s+", re.ASCII)
_SEP = 0x0A  # inter-document separator byte: never alnum


def _gather_runs(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Source indices concatenating ``buf[starts[i] : starts[i]+lens[i]]``
    for every i — the vectorized run-expansion trick. All lens must be
    >= 1 (token/k-gram spans are, by construction)."""
    if len(starts) == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    out = np.ones(int(ends[-1]), dtype=np.int64)
    out[0] = starts[0]
    out[ends[:-1]] = starts[1:] - (starts[:-1] + lens[:-1]) + 1
    return np.cumsum(out)


def word_token_spans(texts) -> tuple:
    """Lowercase-alnum token spans for a batch of texts.

    Returns ``(buf, starts, lens, doc)``: one uint8 buffer holding
    every document's lowered UTF-8 bytes (separator byte between
    documents), and per-token start/length/doc-index arrays in
    (document, position) order. NULL documents contribute no tokens.
    """
    parts = []
    for t in texts:
        parts.append(b"" if t is None else t.lower().encode("utf-8"))
    buf = np.frombuffer(bytes([_SEP]).join(parts), dtype=np.uint8)
    n_docs = len(parts)
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        sizes = np.fromiter(
            (len(p) + 1 for p in parts), dtype=np.int64, count=n_docs
        )
        doc_starts[1:] = np.cumsum(sizes)[:-1]
    alnum = ((buf >= 0x30) & (buf <= 0x39)) | ((buf >= 0x61) & (buf <= 0x7A))
    d = np.diff(alnum.astype(np.int8), prepend=np.int8(0), append=np.int8(0))
    starts = np.nonzero(d == 1)[0].astype(np.int64)
    ends = np.nonzero(d == -1)[0].astype(np.int64)
    lens = ends - starts
    doc = np.searchsorted(doc_starts, starts, side="right") - 1
    return buf, starts, lens, doc


def canonical_token_buffer(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> tuple:
    """Rebuild the batch's tokens as one space-joined buffer (every
    token followed by one 0x20), so any k consecutive same-document
    tokens' k-gram string ``"t1 t2 ... tk"`` is a contiguous slice.

    Returns ``(canon, c_starts)`` — token i occupies
    ``canon[c_starts[i] : c_starts[i]+lens[i]]``."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    total = int(lens.sum())
    canon = np.full(total + n, 0x20, dtype=np.uint8)
    c_starts = np.zeros(n, dtype=np.int64)
    c_starts[1:] = np.cumsum(lens + 1)[:-1]
    src = _gather_runs(starts, lens)
    dst = np.arange(total, dtype=np.int64) + np.repeat(
        np.arange(n, dtype=np.int64), lens
    )
    canon[dst] = buf[src]
    return canon, c_starts


def kgram_spans(
    c_starts: np.ndarray, lens: np.ndarray, doc: np.ndarray, k: int
) -> tuple:
    """(start, len, doc) spans of space-joined word k-grams over the
    canonical buffer: k consecutive tokens of the SAME document."""
    n = len(c_starts)
    if k == 1:
        return c_starts, lens, doc
    if n < k:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    valid = doc[: n - k + 1] == doc[k - 1 :]
    s = c_starts[: n - k + 1][valid]
    e_tok = np.nonzero(valid)[0] + (k - 1)
    l = c_starts[e_tok] + lens[e_tok] - s
    return s, l, doc[: n - k + 1][valid]


def char_ngram_spans(texts, ns: tuple) -> tuple:
    """Whitespace-collapsed lowercase char n-gram spans for a batch.

    Normalization is the JVM twin's: ``lower`` → ASCII ``\\s+`` runs →
    one space → strip ASCII spaces. Returns ``(buf, starts, lens,
    doc, order)`` where the arrays hold every gram of every size in
    ``ns`` and ``order`` re-sorts them to the JVM's per-document
    feature order (all n₁-grams in position order, then all
    n₂-grams, ...) — apply it before hashing when sequence order
    matters."""
    norms = []
    for t in texts:
        norms.append(
            "" if t is None else _WS.sub(" ", t.lower()).strip(" ")
        )
    enc8 = [s.encode("utf-8") for s in norms]
    enc32 = [s.encode("utf-32-le") for s in norms]
    buf = np.frombuffer(b"".join(enc8), dtype=np.uint8)
    cps = np.frombuffer(b"".join(enc32), dtype=np.uint32)
    n_docs = len(norms)
    # per-codepoint UTF-8 byte length → byte offset of each codepoint
    blen = np.ones(len(cps), dtype=np.int64)
    blen[cps >= 0x80] = 2
    blen[cps >= 0x800] = 3
    blen[cps >= 0x10000] = 4
    boff = np.zeros(len(cps) + 1, dtype=np.int64)
    np.cumsum(blen, out=boff[1:])
    # codepoint-index boundaries per document
    doc_cp_starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(
        np.fromiter((len(s) for s in norms), dtype=np.int64, count=n_docs),
        out=doc_cp_starts[1:],
    )
    cp_doc = (
        np.searchsorted(doc_cp_starts[:-1], np.arange(len(cps)), side="right")
        - 1
    )
    all_s, all_l, all_d = [], [], []
    for n in ns:
        m = len(cps) - n + 1
        if m <= 0:
            continue
        valid = cp_doc[:m] == cp_doc[n - 1 :]
        first = np.nonzero(valid)[0]
        all_s.append(boff[first])
        all_l.append(boff[first + n] - boff[first])
        all_d.append(cp_doc[first])
    if not all_s:
        e = np.empty(0, dtype=np.int64)
        return buf, e, e, e, e
    starts = np.concatenate(all_s)
    lens = np.concatenate(all_l)
    doc = np.concatenate(all_d)
    # JVM order: per doc, gram sizes in ns order, positions ascending.
    # Arrays are (size, doc, pos)-ordered; a stable sort on doc alone
    # yields (doc, size, pos).
    order = np.argsort(doc, kind="stable")
    return buf, starts, lens, doc, order
