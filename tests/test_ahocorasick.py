"""Aho-Corasick automaton (operators/ahocorasick) — the q258 gate covers
the Spark path end-to-end; these units pin the automaton itself against
brute force, including the failure/output-link cases."""

import numpy as np
import pytest

from etl_market_survey_spark.operators.ahocorasick import (
    build_automaton,
    scan_text,
)


def brute(patterns, text):
    out = []
    for pi, p in enumerate(patterns):
        for i in range(len(text) - len(p) + 1):
            if text[i : i + len(p)] == p:
                out.append((pi, i + 1))
    return sorted(out)


def test_nested_and_overlapping_patterns():
    pats = ["table", "tab", "able", "an", "scan"]
    auto = build_automaton(pats)
    text = "a table scans tab"
    assert sorted(scan_text(auto, text)) == brute(pats, text)
    # 'table' must fire tab AND able AND table (output links)
    hits = {pats[pi] for pi, _ in scan_text(auto, "table")}
    assert hits == {"table", "tab", "able"}


def test_overlapping_occurrences_all_reported():
    auto = build_automaton(["aa"])
    assert scan_text(auto, "aaaa") == [(0, 1), (0, 2), (0, 3)]


def test_fail_link_mid_pattern():
    # classic: scanning 'ushers' with she/he/hers must yield all three
    pats = ["he", "she", "his", "hers"]
    auto = build_automaton(pats)
    got = sorted((pats[pi], pos) for pi, pos in scan_text(auto, "ushers"))
    assert got == [("he", 3), ("hers", 3), ("she", 2)]


def test_randomized_vs_brute_force():
    r = np.random.RandomState(17)
    alphabet = "abc"
    for _ in range(30):
        pats = list(
            {
                "".join(r.choice(list(alphabet), size=r.randint(1, 4)))
                for _ in range(r.randint(1, 6))
            }
        )
        text = "".join(r.choice(list(alphabet), size=60))
        auto = build_automaton(pats)
        assert sorted(scan_text(auto, text)) == brute(pats, text), (pats, text)


def test_invalid_dictionaries():
    with pytest.raises(ValueError):
        build_automaton([])
    with pytest.raises(ValueError):
        build_automaton(["a", "a"])
    with pytest.raises(ValueError):
        build_automaton(["a", ""])
