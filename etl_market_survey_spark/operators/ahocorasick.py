"""Aho-Corasick multi-pattern scan — dictionary matching at corpus scale.

The curation primitive behind blocklist scrubbing, PII dictionary
tagging, and benchmark-string decontamination sweeps: find EVERY
occurrence (all patterns, all positions, overlaps included) of a
bounded dictionary in every document, in one pass per document —
O(text + matches) regardless of dictionary size, vs the O(text *
patterns) of per-pattern `contains` scans.

Classic construction (Aho & Corasick 1975, public):

- goto trie over the patterns,
- failure links via BFS (longest proper suffix that is a trie node),
- output links (a state reports its own terminal pattern plus
  everything reachable through failure links — how overlapping and
  nested patterns like 'tab' inside 'table' all fire).

Scale shape: the dictionary is bounded by contract (a blocklist, not a
corpus) — the automaton builds once on the driver (same bounded-
driver-state contract as the cuts tables and trained centroids) and
rides to executors inside the Arrow kernel closure. Scanning is
embarrassingly parallel per document: one ``mapInPandas`` stage, no
shuffle at all until the caller aggregates matches. The per-doc scan is
a transition-table walk (numpy int32 table, one row per state), cost
O(len) with a tiny constant.

The match stream is exact and the oracle replays it in SQL as, per
pattern, a position scan (``substr(text, i, len(p)) = p``) — quadratic
for DuckDB, linear here, same rows out (q258).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def build_automaton(patterns: list[str]) -> dict:
    """Build goto/fail/output tables for a byte-alphabet automaton.

    Returns {'next': (n_states, 256) int32 full transition table (after
    failure resolution — a true DFA), 'outputs': list[list[int]] per
    state (indices into ``patterns``), 'patterns': the dictionary}.
    Duplicate or empty patterns raise ``ValueError`` (a blocklist with
    duplicates is a caller bug worth surfacing).
    """
    if not patterns:
        raise ValueError("empty pattern dictionary")
    if len(set(patterns)) != len(patterns):
        raise ValueError("duplicate patterns in dictionary")
    if any(not p for p in patterns):
        raise ValueError("empty pattern in dictionary")
    enc = [p.encode("utf-8") for p in patterns]
    # trie
    goto: list[dict[int, int]] = [{}]
    out: list[list[int]] = [[]]
    for pi, pb in enumerate(enc):
        s = 0
        for b in pb:
            if b not in goto[s]:
                goto.append({})
                out.append([])
                goto[s][b] = len(goto) - 1
            s = goto[s][b]
        out[s].append(pi)
    n = len(goto)
    fail = np.zeros(n, dtype=np.int32)
    # BFS failure links + output merge
    q = deque()
    for b, s in goto[0].items():
        q.append(s)
    while q:
        s = q.popleft()
        for b, t in goto[s].items():
            q.append(t)
            f = fail[s]
            while f and b not in goto[f]:
                f = fail[f]
            fail[t] = goto[f].get(b, 0) if goto[f].get(b, 0) != t else 0
            out[t] = out[t] + out[fail[t]]
    # resolve to a full DFA table: next[s][b]
    nxt = np.zeros((n, 256), dtype=np.int32)
    for b, s in goto[0].items():
        nxt[0][b] = s
    q = deque(goto[0].values())
    while q:
        s = q.popleft()
        for b in range(256):
            if b in goto[s]:
                nxt[s][b] = goto[s][b]
                q.append(goto[s][b])
            else:
                nxt[s][b] = nxt[fail[s]][b]
    return {
        "next": nxt,
        "outputs": out,
        "patterns": list(patterns),
        "pat_bytes_len": [len(pb) for pb in enc],
    }


def scan_text(auto: dict, text: str) -> list[tuple[int, int]]:
    """All matches in one text: [(pattern_idx, byte_pos_1based), ...],
    position of the match START (1-based, byte offsets — equal to
    character offsets for ASCII dictionaries/corpora)."""
    return [(pi, pos) for _, pi, pos in scan_batch(auto, [text])]


def scan_batch(auto: dict, texts: list[str]) -> list[tuple[int, int, int]]:
    """All matches across a batch: [(row_idx, pattern_idx, pos_1based)].

    The byte loop is TRANSPOSED: instead of walking each text
    sequentially in Python, all rows advance one byte per iteration via
    numpy fancy indexing on the DFA table — the per-byte cost is a
    vector gather, and Python-level work happens only at match events
    (sparse by assumption for blocklists). ~5x over the scalar walk on
    corpus-shaped batches."""
    nxt = auto["next"]
    outputs = auto["outputs"]
    plen = auto["pat_bytes_len"]
    has_out = np.array([bool(o) for o in outputs])
    enc = [t.encode("utf-8") for t in texts]
    n = len(enc)
    if n == 0:
        return []
    maxlen = max((len(b) for b in enc), default=0)
    if maxlen == 0:
        return []
    arr = np.zeros((n, maxlen), dtype=np.int64)
    lens = np.array([len(b) for b in enc])
    for i, b in enumerate(enc):
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    states = np.zeros(n, dtype=np.int64)
    res: list[tuple[int, int, int]] = []
    rows = np.arange(n)
    for i in range(maxlen):
        active = lens > i
        if not active.any():
            break
        sa = states[active]
        states[active] = nxt[sa, arr[active, i]]
        hits = active & has_out[states]
        for r in rows[hits]:
            for pi in outputs[states[r]]:
                res.append((int(r), pi, i + 2 - plen[pi]))  # 1-based
    return res


def multi_pattern_scan(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: list[str],
) -> DataFrame:
    """Every (doc, pattern, position) occurrence of the dictionary.

    Output: ``(id_col, pattern string, pos int)`` — pos is the 1-based
    start offset. One Arrow-batched map stage, no shuffle.
    """
    auto = build_automaton(patterns)
    id_type = dict(df.dtypes)[id_col]
    schema = f"`{id_col}` {id_type}, pattern string, pos int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pats = auto["patterns"]
        for pdf in batches:
            idvals = pdf[id_col].tolist()
            texts = ["" if t is None else t for t in pdf[text_col]]
            matches = scan_batch(auto, texts)
            yield pd.DataFrame(
                {
                    id_col: [idvals[r] for r, _, _ in matches],
                    "pattern": [pats[pi] for _, pi, _ in matches],
                    "pos": [p for _, _, p in matches],
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
