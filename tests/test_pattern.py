"""Pattern automaton tests: NFA compile, quantifier semantics, Spark
fold == driver reference == lazy-regex counting on random sequences."""

import random
import re

import pytest

from etl_market_survey_spark.operators.pattern import (
    compile_nfa,
    match_events_py,
    pattern_match,
)

_ABC = [("a", "1"), ("b", "+"), ("c", "1")]


def _run(spark, rows, pattern):
    df = spark.createDataFrame(rows, "k long, us long, t string")
    out = pattern_match(df, ["k"], "us", "t", pattern).collect()
    return {r.k: (r.n_matches, r.first_match_end_ts) for r in out}


def test_quantifier_semantics(spark):
    rows = [
        # k=1: a b b c -> shortest match ends at first c (ts 4)
        (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c"),
        # k=2: a c -> b+ requires one b, no match
        (2, 1, "a"), (2, 2, "c"),
        # k=3: two disjoint matches a b c a b c
        (3, 1, "a"), (3, 2, "b"), (3, 3, "c"),
        (3, 4, "a"), (3, 5, "b"), (3, 6, "c"),
        # k=4: noise types are ignored entirely
        (4, 1, "a"), (4, 2, "x"), (4, 3, "b"), (4, 4, "y"), (4, 5, "c"),
    ]
    got = _run(spark, rows, _ABC)
    assert got[1] == (1, 4)
    assert got[2] == (0, None)
    assert got[3] == (2, 3)
    assert got[4] == (1, 5)


def test_optional_and_star(spark):
    pat = [("a", "1"), ("b", "?"), ("c", "*"), ("d", "1")]
    rows = [
        (1, 1, "a"), (1, 2, "d"),                                  # skip both
        (2, 1, "a"), (2, 2, "b"), (2, 3, "d"),                     # b only
        (3, 1, "a"), (3, 2, "c"), (3, 3, "c"), (3, 4, "d"),        # c twice
        (4, 1, "a"), (4, 2, "b"), (4, 3, "c"), (4, 4, "d"),        # both
        (5, 1, "a"), (5, 2, "c"), (5, 3, "b"), (5, 4, "d"),        # wrong order
    ]
    got = _run(spark, rows, pat)
    assert got[1] == (1, 2)
    assert got[2] == (1, 3)
    assert got[3] == (1, 4)
    assert got[4] == (1, 4)
    assert got[5] == (0, None)


def test_overlap_restarts_strictly_after_match(spark):
    # aa with pattern 'a a?': shortest match is the single 'a'; restart
    # consumes the second 'a' as a new match -> 3 matches for 'aaa'
    pat = [("a", "1"), ("a", "?")]
    rows = [(1, i, "a") for i in range(1, 4)]
    got = _run(spark, rows, pat)
    assert got[1] == (3, 1)


def test_empty_pattern_and_nullable_rejected():
    with pytest.raises(ValueError):
        compile_nfa([])
    with pytest.raises(ValueError):
        compile_nfa([("a", "*"), ("b", "?")])
    with pytest.raises(ValueError):
        compile_nfa([("a", "2")])


def _lazy_regex_count(s: str, pattern) -> int:
    frag = {"1": "{1}", "?": "??", "+": "+?", "*": "*?"}
    rx = "".join(re.escape(sym) + frag[q] for sym, q in pattern)
    return len(re.findall(rx, s))


@pytest.mark.parametrize(
    "pattern",
    [
        _ABC,
        [("a", "1"), ("b", "?"), ("a", "1")],
        [("a", "+"), ("b", "*"), ("c", "?"), ("a", "1")],
        [("s", "1"), ("v", "+"), ("p", "1")],
    ],
)
def test_reference_matches_lazy_regex_on_random_sequences(pattern):
    rng = random.Random(42)
    alphabet = sorted({sym for sym, _ in pattern})
    for _ in range(300):
        seq = [rng.choice(alphabet) for _ in range(rng.randrange(0, 20))]
        n_py, _ = match_events_py(seq, pattern)
        assert n_py == _lazy_regex_count("".join(seq), pattern), (pattern, seq)


def test_spark_fold_matches_reference_on_random_sequences(spark):
    rng = random.Random(7)
    alphabet = ["a", "b", "c", "x"]
    rows, expect = [], {}
    for k in range(60):
        seq = [rng.choice(alphabet) for _ in range(rng.randrange(1, 25))]
        rows += [(k, i + 1, t) for i, t in enumerate(seq)]
        filtered = [t for t in seq if t != "x"]
        n, end_idx = match_events_py(filtered, _ABC)
        end_ts = None
        if end_idx is not None:
            # map filtered index back to 1-based ts in the raw sequence
            pos = [i + 1 for i, t in enumerate(seq) if t != "x"]
            end_ts = pos[end_idx]
        expect[k] = (n, end_ts)
    got = _run(spark, rows, _ABC)
    for k, want in expect.items():
        assert got.get(k, (0, None)) == want, k


# --- symbol-class tokens (alternation within a token) -----------------------


def test_symbol_class_tokens(spark):
    # a (b|c)+ d : either symbol advances/extends the middle token
    pat = [("a", "1"), (("b", "c"), "+"), ("d", "1")]
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"),
        (2, 1, "a"), (2, 2, "c"), (2, 3, "d"),
        (3, 1, "a"), (3, 2, "d"),          # no b/c at all -> no match
    ]
    got = _run(spark, rows, pat)
    assert got[1] == (1, 4)
    assert got[2] == (1, 3)
    assert got[3] == (0, None)


def test_symbol_class_reference_matches_regex():
    pat = [("a", "1"), (("b", "c"), "*"), ("d", "1")]
    rng = random.Random(9)
    for _ in range(300):
        seq = [rng.choice("abcd") for _ in range(rng.randrange(0, 16))]
        n_py, _ = match_events_py(seq, pat)
        assert n_py == len(re.findall("a[bc]*?d", "".join(seq))), seq


def test_symbol_class_validation():
    import pytest

    with pytest.raises(ValueError):
        compile_nfa([((), "1")])
    with pytest.raises(ValueError):
        compile_nfa([((1, 2), "1")])


# --- full regex patterns (alternation + grouping) ---------------------------


def test_regex_reference_matches_lazy_regex():
    from etl_market_survey_spark.operators.pattern import compile_regex

    cases = [
        ("a (b|c)* d", "a[bc]*?d"),
        ("a (b|c)+ d", "a[bc]+?d"),
        ("(a|x) b? d", "[ax]b??d"),
        ("a ((b c)|x)+ d", "a(?:bc|x)+?d"),
        ("a b d", "abd"),
    ]
    rng = random.Random(11)
    for pat, rx in cases:
        alphabet = set(compile_regex(pat)[0])
        for _ in range(300):
            seq = [rng.choice("abcdx") for _ in range(rng.randrange(0, 24))]
            filtered = [t for t in seq if t in alphabet]
            n_py, _ = match_events_py(filtered, pat)
            assert n_py == len(re.findall(rx, "".join(filtered))), (pat, seq)


def test_regex_spark_fold_matches_reference(spark):
    pat = "a (b|c)+ d"
    rng = random.Random(13)
    rows, expect = [], {}
    for k in range(40):
        seq = [rng.choice("abcdx") for _ in range(rng.randrange(1, 20))]
        rows += [(k, i + 1, t) for i, t in enumerate(seq)]
        filtered = [t for t in seq if t != "x"]
        n, end_idx = match_events_py(filtered, pat)
        end_ts = None
        if end_idx is not None:
            pos = [i + 1 for i, t in enumerate(seq) if t != "x"]
            end_ts = pos[end_idx]
        expect[k] = (n, end_ts)
    got = _run(spark, rows, pat)
    for k, want in expect.items():
        assert got.get(k, (0, None)) == want, k


def test_regex_validation():
    from etl_market_survey_spark.operators.pattern import compile_regex

    for bad in ["", "(a", "a)", "a | ", "*a", "a**"]:
        if bad == "a**":
            compile_regex("a+")  # sanity: quantifier chains on atoms are fine
            compile_regex("(a+)+")  # stacked reps parse (still must match non-empty)
            continue
        with pytest.raises(ValueError):
            compile_regex(bad)
    for empty in ["a*", "(a|b)*", "a? b?"]:
        with pytest.raises(ValueError):
            compile_regex(empty)


# ---------------------------------------------------------------------------
# capture groups (per-token first-match timestamps)
# ---------------------------------------------------------------------------

CAPS_PAT = [("signup", "1"), ("view", "+"), ("purchase", "1")]


def test_captures_known_sequences(spark):
    from etl_market_survey_spark.operators.pattern import (
        match_events_captures_py,
        pattern_match_captures,
    )

    seqs = {
        1: [("signup", 10), ("view", 20), ("view", 30), ("purchase", 40)],
        2: [("signup", 10), ("purchase", 20), ("view", 30), ("purchase", 40)],
        3: [("signup", 10), ("view", 20), ("signup", 25), ("view", 30), ("purchase", 40)],
        4: [("signup", 1), ("signup", 2), ("view", 3), ("purchase", 4)],
    }
    # 1: plain match, view+ captures FIRST view. 2: contiguity kills the
    # attempt (purchase interrupts) -> no match. 3: first attempt dies at
    # the second signup; surviving attempt starts there. 4: leftmost
    # regex start is the SECOND signup (first can't continue).
    want = {
        1: (1, 10, 20, 40),
        2: (0, None, None, None),
        3: (1, 25, 30, 40),
        4: (1, 2, 3, 4),
    }
    rows = [(k, ts, t) for k, sq in seqs.items() for (t, ts) in sq]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        r["user_id"]: (r["n_matches"], r["t_step1"], r["t_step2"], r["t_step3"])
        for r in pattern_match_captures(df, ["user_id"], "ts", "event_type", CAPS_PAT).collect()
    }
    assert got == want
    for k, sq in seqs.items():
        n, caps = match_events_captures_py(sq, CAPS_PAT)
        assert (n, *(caps or [None] * 3)) == want[k]


def test_captures_count_equals_bitmask_reference():
    import random

    from etl_market_survey_spark.operators.pattern import (
        match_events_captures_py,
        match_events_py,
    )

    random.seed(1234)
    m = {"s": "signup", "v": "view", "p": "purchase"}
    for _ in range(2000):
        seq = [(m[random.choice("svp")], i) for i in range(random.randint(0, 15))]
        n_caps, caps = match_events_captures_py(seq, CAPS_PAT)
        n_ref, _ = match_events_py([t for t, _ in seq], CAPS_PAT)
        assert n_caps == n_ref
        if n_caps > 0:
            assert caps is not None and caps[0] < caps[1] < caps[2]
        else:
            assert caps is None


def test_captures_rejects_optional_quantifiers():
    from etl_market_survey_spark.operators.pattern import match_events_captures_py

    with pytest.raises(ValueError):
        match_events_captures_py([], [("a", "1"), ("b", "*"), ("c", "1")])
    with pytest.raises(ValueError):
        match_events_captures_py([], [("a", "?"), ("c", "1")])


def test_captures_symbol_class_token(spark):
    from etl_market_survey_spark.operators.pattern import pattern_match_captures

    pat = [("signup", "1"), (("view", "click"), "+"), ("purchase", "1")]
    rows = [
        (1, 10, "signup"), (1, 20, "click"), (1, 30, "view"), (1, 40, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    r = pattern_match_captures(df, ["user_id"], "ts", "event_type", pat).collect()[0]
    assert (r["n_matches"], r["t_step1"], r["t_step2"], r["t_step3"]) == (1, 10, 20, 40)
