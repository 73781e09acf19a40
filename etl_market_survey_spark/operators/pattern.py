"""General event-pattern matching (MATCH_RECOGNIZE-lite, the funnel
generalized to a regex over event types).

``pattern_match`` accepts a concatenation of quantified event-type
tokens — ``[("signup", "1"), ("view", "+"), ("purchase", "1")]`` reads
as the regex ``signup view+ purchase`` — and, per key, scans the
time-ordered sequence of events whose type is in the pattern alphabet
(events of other types are dropped first, the same contract as
``funnel_match``; reference analogue: the ordered trigger-sequence
logic of /root/reference/scripts/time_resolution_beta_scan.py:32-55,
generalized).

Match semantics are **leftmost-shortest, non-overlapping**: the scan
reports a match at the earliest event where ANY active start completes
the pattern, counts it, and restarts strictly after that event. This is
the deterministic streaming-friendly policy (no lookahead), and for
patterns whose matches are anchored by a final concrete token it counts
exactly like a lazy (non-greedy) regex scan — which is what the DuckDB
oracle replays with ``regexp_extract_all`` over a per-key code string.

Execution is one shuffle: ``groupBy(key).agg(array_sort(collect_list
(struct(ts, type))))`` then a single ``F.aggregate`` fold whose state is
``(active-state bitmask, n_matches, first_end)``. The NFA (compiled on
the driver: epsilon-closure + per-symbol transition masks) is unrolled
into pure JVM bitwise expressions — no Python in the hot path, state
per key is one long. Per-key event counts bound the array, the same
contract as every per-key window here; skew splits on the exchange via
AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_QUANTS = ("1", "?", "+", "*")


def _token_syms(tok) -> tuple[str, ...]:
    """A token's symbol set: a bare string or an iterable of strings
    (symbol class = alternation within the token, e.g.
    ``(("view", "click"), "+")`` reads as ``(view|click)+``)."""
    if isinstance(tok, str):
        return (tok,)
    syms = tuple(tok)
    if not syms or not all(isinstance(s, str) for s in syms):
        raise ValueError(f"bad token symbols {tok!r}")
    return syms


def compile_nfa(pattern: Sequence[tuple]):
    """Compile quantified tokens into (alphabet, init_mask, accept_bit,
    table) where ``table[symbol][state]`` is the bitmask of
    epsilon-closed successor states.

    Linear chain construction — state ``i`` means "tokens 0..i-1
    completed"; token ``i`` (symbols ``A``, quantifier ``q``) adds:
    ``i --a--> i+1`` for each a in A; ``i --eps--> i+1`` for ``?``/``*``;
    self-loops ``i --a--> i`` for ``*``; self-loops ``i+1 --a--> i+1``
    for ``+`` (extra repeats after completion).
    """
    pattern = [(_token_syms(tok), q) for tok, q in pattern]
    if not pattern:
        raise ValueError("pattern must be non-empty")
    for syms, q in pattern:
        if q not in _QUANTS:
            raise ValueError(f"bad quantifier {q!r} for {syms!r} (use 1 ? + *)")
    n_states = len(pattern) + 1
    if n_states > 62:
        raise ValueError("pattern too long (max 61 tokens)")
    accept = n_states - 1

    eps: list[set[int]] = [set() for _ in range(n_states)]
    moves: list[dict[str, set[int]]] = [dict() for _ in range(n_states)]

    def add_move(s: int, sym: str, t: int) -> None:
        moves[s].setdefault(sym, set()).add(t)

    for i, (syms, q) in enumerate(pattern):
        for sym in syms:
            add_move(i, sym, i + 1)
            if q == "*":
                add_move(i, sym, i)
            if q == "+":
                add_move(i + 1, sym, i + 1)
        if q in ("?", "*"):
            eps[i].add(i + 1)

    def closure(states: set[int]) -> set[int]:
        out, stack = set(states), list(states)
        while stack:
            s = stack.pop()
            for t in eps[s]:
                if t not in out:
                    out.add(t)
                    stack.append(t)
        return out

    init = closure({0})
    if accept in init:
        raise ValueError("pattern matches the empty sequence; add a concrete token")
    init_mask = sum(1 << s for s in init)

    alphabet = []
    for syms, _ in pattern:
        for sym in syms:
            if sym not in alphabet:
                alphabet.append(sym)
    table: dict[str, list[int]] = {}
    for sym in alphabet:
        row = []
        for s in range(n_states):
            succ = closure(moves[s].get(sym, set()))
            row.append(sum(1 << t for t in succ))
        table[sym] = row
    return alphabet, init_mask, accept, table


def match_events_py(types: Sequence[str], pattern: Sequence[tuple[str, str]]):
    """Driver-side reference of the identical semantics (for tests):
    returns (n_matches, first_end_index or None) over an already
    alphabet-filtered, time-ordered type sequence."""
    _, init_mask, accept, table = compile_nfa(pattern)
    n_states = len(list(pattern)) + 1
    mask, n_matches, first_end = init_mask, 0, None
    for idx, t in enumerate(types):
        row = table.get(t)
        if row is None:
            continue
        moved = 0
        for s in range(n_states):
            if mask >> s & 1:
                moved |= row[s]
        mask = moved | init_mask
        if mask >> accept & 1:
            n_matches += 1
            if first_end is None:
                first_end = idx
            mask = init_mask
    return n_matches, first_end


def pattern_match(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    type_col: str,
    pattern: Sequence[tuple[str, str]],
) -> DataFrame:
    """Per key: ``n_matches`` (non-overlapping leftmost-shortest) and
    ``first_match_end_ts`` (ts of the event completing the first match,
    null if none). ``ts_col`` must be integral (e.g. epoch-µs); ties at
    equal ts order by event type (mirrored in any oracle)."""
    key_cols = list(key_cols)
    alphabet, init_mask, accept, table = compile_nfa(pattern)
    n_states = len(list(pattern)) + 1

    ev = events.filter(F.col(type_col).isin(alphabet)).select(
        *key_cols,
        F.struct(
            F.col(ts_col).cast("long").alias("ts"), F.col(type_col).alias("t")
        ).alias("e"),
    )
    per_key = ev.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list("e")).alias("_evs")
    )

    init = F.struct(
        F.lit(init_mask).cast("long").alias("mask"),
        F.lit(0).cast("long").alias("n"),
        F.lit(None).cast("long").alias("first_end"),
    )

    def step(acc: Column, x: Column) -> Column:
        # transition row for this event's symbol: nested when over the
        # (tiny) alphabet, last symbol as the fallthrough — the input is
        # alphabet-filtered so the fallthrough is always that symbol.
        def lit_row(sym: str) -> Column:
            return F.array(*[F.lit(m).cast("long") for m in table[sym]])

        row = lit_row(alphabet[-1])
        for sym in alphabet[:-1]:
            row = F.when(x["t"] == sym, lit_row(sym)).otherwise(row)
        moved = F.lit(0).cast("long")
        for s in range(n_states):
            bit_on = F.shiftright(acc["mask"], s).bitwiseAND(F.lit(1)) == 1
            moved = moved.bitwiseOR(
                F.when(bit_on, F.element_at(row, s + 1)).otherwise(F.lit(0).cast("long"))
            )
        mask = moved.bitwiseOR(F.lit(init_mask).cast("long"))
        hit = F.shiftright(mask, accept).bitwiseAND(F.lit(1)) == 1
        return F.struct(
            F.when(hit, F.lit(init_mask).cast("long")).otherwise(mask).alias("mask"),
            F.when(hit, acc["n"] + 1).otherwise(acc["n"]).alias("n"),
            F.when(hit & acc["first_end"].isNull(), x["ts"])
            .otherwise(acc["first_end"])
            .alias("first_end"),
        )

    folded = per_key.select(*key_cols, F.aggregate("_evs", init, step).alias("_st"))
    return folded.select(
        *key_cols,
        F.col("_st.n").alias("n_matches"),
        F.col("_st.first_end").alias("first_match_end_ts"),
    )
