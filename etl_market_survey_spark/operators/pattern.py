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


# ---------------------------------------------------------------------------
# Full regex patterns (alternation + grouping) — Thompson construction.
#
# ``compile_regex("signup (view|click)* purchase")`` accepts the grammar
#
#     alt    := concat ('|' concat)*
#     concat := repeat+
#     repeat := atom ('?' | '+' | '*')*
#     atom   := SYMBOL | '(' alt ')'
#
# where SYMBOL is any run of characters outside ``()|?+*`` and
# whitespace (event-type names). The classic Thompson fragments (two
# states per symbol, two per alt/quantifier) build an eps-NFA; the
# same epsilon-closure pass as ``compile_nfa`` flattens it into
# per-symbol successor-mask tables, and unreachable states are
# renumbered away so the unrolled JVM fold stays as small as the
# pattern needs. Output contract is identical to ``compile_nfa`` —
# ``pattern_match`` takes either form.
# ---------------------------------------------------------------------------


def _parse_regex(src: str):
    """Parse to an AST of ('sym', s) | ('cat', a, b) | ('alt', a, b) |
    ('rep', node, q)."""
    toks: list[str] = []
    i = 0
    while i < len(src):
        c = src[i]
        if c.isspace():
            i += 1
        elif c in "()|?+*":
            toks.append(c)
            i += 1
        else:
            j = i
            while j < len(src) and not src[j].isspace() and src[j] not in "()|?+*":
                j += 1
            toks.append(src[i:j])
            i = j
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        pos += 1
        return toks[pos - 1]

    def atom():
        t = peek()
        if t == "(":
            take()
            node = alt()
            if peek() != ")":
                raise ValueError(f"unbalanced '(' in {src!r}")
            take()
            return node
        if t is None or t in ")|?+*":
            raise ValueError(f"expected symbol or '(' at token {t!r} in {src!r}")
        return ("sym", take())

    def repeat():
        node = atom()
        while peek() in ("?", "+", "*"):
            node = ("rep", node, take())
        return node

    def concat():
        node = repeat()
        while peek() is not None and peek() not in (")", "|"):
            node = ("cat", node, repeat())
        return node

    def alt():
        node = concat()
        while peek() == "|":
            take()
            node = ("alt", node, concat())
        return node

    tree = alt()
    if pos != len(toks):
        raise ValueError(f"trailing tokens {toks[pos:]!r} in {src!r}")
    return tree


def compile_regex(src: str):
    """Compile a regex string to the same (alphabet, init_mask,
    accept_bit, table) contract as ``compile_nfa``."""
    tree = _parse_regex(src)

    eps: list[set[int]] = []
    moves: list[dict[str, set[int]]] = []
    alphabet: list[str] = []

    def new_state() -> int:
        eps.append(set())
        moves.append({})
        return len(eps) - 1

    def build(node) -> tuple[int, int]:
        kind = node[0]
        if kind == "sym":
            s, t = new_state(), new_state()
            moves[s].setdefault(node[1], set()).add(t)
            if node[1] not in alphabet:
                alphabet.append(node[1])
            return s, t
        if kind == "cat":
            s1, t1 = build(node[1])
            s2, t2 = build(node[2])
            eps[t1].add(s2)
            return s1, t2
        if kind == "alt":
            s1, t1 = build(node[1])
            s2, t2 = build(node[2])
            s, t = new_state(), new_state()
            eps[s] |= {s1, s2}
            eps[t1].add(t)
            eps[t2].add(t)
            return s, t
        # rep
        s1, t1 = build(node[1])
        q = node[2]
        s, t = new_state(), new_state()
        eps[s].add(s1)
        eps[t1].add(t)
        if q in ("?", "*"):
            eps[s].add(t)
        if q in ("+", "*"):
            eps[t1].add(s1)
        return s, t

    start, accept = build(tree)

    def closure(states: set[int]) -> set[int]:
        out, stack = set(states), list(states)
        while stack:
            s = stack.pop()
            for t in eps[s]:
                if t not in out:
                    out.add(t)
                    stack.append(t)
        return out

    init = closure({start})
    if accept in init:
        raise ValueError("pattern matches the empty sequence; add a concrete token")

    # keep only states reachable via symbol moves (post-closure): they
    # are the only bits the fold can ever set
    live: list[int] = sorted(init)
    seen = set(live)
    frontier = list(live)
    while frontier:
        nxt: list[int] = []
        for s in frontier:
            for sym_targets in moves[s].values():
                for t in closure(sym_targets):
                    if t not in seen:
                        seen.add(t)
                        nxt.append(t)
        live.extend(sorted(set(nxt)))
        frontier = nxt
    renum = {old: i for i, old in enumerate(live)}
    n_states = len(live)
    if n_states > 62:
        raise ValueError(f"pattern too large ({n_states} NFA states; max 62)")

    init_mask = sum(1 << renum[s] for s in init)
    table: dict[str, list[int]] = {}
    for sym in alphabet:
        row = [0] * n_states
        for old, new in renum.items():
            succ = closure(moves[old].get(sym, set()))
            row[new] = sum(1 << renum[t] for t in succ if t in renum)
        table[sym] = row
    accept_bit = renum.get(accept)
    if accept_bit is None:
        raise ValueError("pattern can never match (accept state unreachable)")
    return alphabet, init_mask, accept_bit, table


def _compile(pattern):
    """Dispatch: regex string or quantified-token sequence."""
    if isinstance(pattern, str):
        return compile_regex(pattern)
    return compile_nfa(pattern)


def match_events_py(types: Sequence[str], pattern):
    """Driver-side reference of the identical semantics (for tests):
    returns (n_matches, first_end_index or None) over an already
    alphabet-filtered, time-ordered type sequence."""
    _, init_mask, accept, table = _compile(pattern)
    n_states = len(next(iter(table.values())))
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


def _captures_pattern(pattern: Sequence[tuple]):
    """Validate + normalize a captures-capable pattern: quantifiers
    restricted to 1/+ (no epsilon edges -> every chain state has exactly
    one fresh predecessor and at most a self-loop). Returns
    [(symbol_set, is_plus)] per token."""
    toks = []
    for tok, q in pattern:
        if q not in ("1", "+"):
            raise ValueError(
                f"captures support quantifiers 1/+ only (got {q!r}); "
                "?/* make token completion undefined"
            )
        toks.append((_token_syms(tok), q == "+"))
    return toks


def match_events_captures_py(types_ts: Sequence[tuple], pattern: Sequence[tuple]):
    """Driver-side reference for ``pattern_match_captures`` semantics
    (for tests): over an alphabet-filtered, time-ordered list of
    (type, ts) pairs, returns (n_matches, [t_step1..t_stepK] or None).

    Each active chain state carries the step-time history of the path
    that reached it; on simultaneous self-loop + fresh entry the older
    (leftmost) attempt wins. Captures freeze at the FIRST match; for a
    ``+`` token the capture is the first event of its run."""
    toks = _captures_pattern(pattern)
    k = len(toks)
    n_matches, caps = 0, None
    # hist[j] = step-times list for chain state j+1, or None if inactive
    hist: list = [None] * k
    for t, ts in types_ts:
        new_hist: list = [None] * k
        for j, (syms, is_plus) in enumerate(toks):
            if t in syms:
                if is_plus and hist[j] is not None:  # self-loop: older wins
                    new_hist[j] = hist[j]
                elif j == 0 or hist[j - 1] is not None:  # fresh entry
                    prev = hist[j - 1] if j > 0 else [None] * k
                    new_hist[j] = prev[:j] + [ts] + [None] * (k - j - 1)
        if new_hist[k - 1] is not None:  # accept
            n_matches += 1
            if caps is None:
                caps = new_hist[k - 1]
            new_hist = [None] * k
        hist = new_hist
    return n_matches, caps


def pattern_match_captures(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    type_col: str,
    pattern: Sequence[tuple],
) -> DataFrame:
    """``pattern_match`` plus per-token capture timestamps: for the
    FIRST match per key, ``t_step{j}`` (1-based) is the ts of the event
    that completed token ``j`` on the match's own path — the funnel's
    per-step times generalized to quantified contiguous patterns. For a
    ``+`` token the capture is the first event of its run.

    Token-list form with quantifiers ``1``/``+`` only: without epsilon
    edges every chain state has exactly one fresh predecessor, so each
    active state can carry the step-time history of the path that
    reached it (history = k longs); when a self-loop and a fresh entry
    derive the same state, the older (leftmost) attempt wins — matching
    ``pattern_match``'s counting policy exactly.

    Same execution contract as ``pattern_match``: one shuffle, one JVM
    fold; per-key state grows to O(n_tokens^2) longs."""
    key_cols = list(key_cols)
    toks = _captures_pattern(pattern)
    k = len(toks)
    alphabet = []
    for syms, _ in toks:
        for sym in syms:
            if sym not in alphabet:
                alphabet.append(sym)

    ev = events.filter(F.col(type_col).isin(alphabet)).select(
        *key_cols,
        F.struct(
            F.col(ts_col).cast("long").alias("ts"), F.col(type_col).alias("t")
        ).alias("e"),
    )
    per_key = ev.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list("e")).alias("_evs")
    )

    null_long = F.lit(None).cast("long")
    null_hist = F.lit(None).cast("array<bigint>")
    init = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.array(*[null_hist for _ in range(k)]).alias("h"),
        null_hist.alias("caps"),
    )

    def step(acc: Column, x: Column) -> Column:
        # new history per chain state j (1-based token j = element j of
        # acc["h"]); built entirely from the pre-event state
        new_h = []
        for j, (syms, is_plus) in enumerate(toks):
            sym_ok = x["t"].isin(list(syms))
            prev_self = F.element_at(acc["h"], j + 1)
            fresh_src = (
                F.array(*[null_long for _ in range(k)])
                if j == 0
                else F.element_at(acc["h"], j)
            )
            stamped = F.array(
                *[
                    F.element_at(fresh_src, i + 1) if i < j else
                    (x["ts"] if i == j else null_long)
                    for i in range(k)
                ]
            )
            fresh_ok = (
                F.lit(True) if j == 0 else F.element_at(acc["h"], j).isNotNull()
            )
            cond_stay = sym_ok & F.lit(is_plus) & prev_self.isNotNull()
            cond_fresh = sym_ok & fresh_ok
            new_h.append(
                F.when(cond_stay, prev_self)
                .when(cond_fresh, stamped)
                .otherwise(null_hist)
            )
        hit = new_h[k - 1].isNotNull()
        reset = F.array(*[null_hist for _ in range(k)])
        return F.struct(
            F.when(hit, acc["n"] + 1).otherwise(acc["n"]).alias("n"),
            F.when(hit, reset).otherwise(F.array(*new_h)).alias("h"),
            F.coalesce(acc["caps"], F.when(hit, new_h[k - 1])).alias("caps"),
        )

    folded = per_key.select(*key_cols, F.aggregate("_evs", init, step).alias("_st"))
    caps = [
        F.element_at("_st.caps", j).alias(f"t_step{j}") for j in range(1, k + 1)
    ]
    return folded.select(*key_cols, F.col("_st.n").alias("n_matches"), *caps)


def pattern_match(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    type_col: str,
    pattern,
) -> DataFrame:
    """Per key: ``n_matches`` (non-overlapping leftmost-shortest) and
    ``first_match_end_ts`` (ts of the event completing the first match,
    null if none). ``ts_col`` must be integral (e.g. epoch-µs); ties at
    equal ts order by event type (mirrored in any oracle).

    ``pattern`` is either a quantified-token sequence (``compile_nfa``)
    or a regex string with alternation/grouping (``compile_regex``,
    e.g. ``"signup (view|click)* purchase"``)."""
    key_cols = list(key_cols)
    alphabet, init_mask, accept, table = _compile(pattern)
    n_states = len(next(iter(table.values())))

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
