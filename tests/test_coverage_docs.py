"""COVERAGE.md / README.md count claims must match the registry exactly
(VERDICT r1 flagged drift here; this pins the docs to the code)."""

import re


def _registry_counts():
    from etl_market_survey_spark.plans import registry

    return len(registry.QUERIES), len(registry.ORACLE)


def test_coverage_md_counts_match_registry():
    n_q, n_oracle = _registry_counts()
    text = open("COVERAGE.md").read()
    m = re.search(r"(\d+) registered queries: (\d+) exact", text)
    assert m, "COVERAGE.md summary line missing"
    assert int(m.group(1)) == n_q, f"COVERAGE says {m.group(1)}, registry has {n_q}"
    assert int(m.group(2)) == n_oracle, (
        f"COVERAGE says {m.group(2)} exact, registry has {n_oracle} oracles"
    )
    m2 = re.search(r"(\d+) weak", text)
    assert m2 and int(m2.group(1)) == n_q - n_oracle


def test_readme_counts_match_registry():
    n_q, n_oracle = _registry_counts()
    text = open("README.md").read()
    m = re.search(r"\((\d+) queries,", text)
    assert m and int(m.group(1)) == n_q
    m2 = re.search(r"\((\d+) of (\d+) queries bit-exact", text)
    assert m2 and (int(m2.group(1)), int(m2.group(2))) == (n_oracle, n_q)


def test_every_query_name_well_formed():
    from etl_market_survey_spark.plans import registry

    for name in registry.QUERIES:
        assert re.match(r"^q\d+_[a-z0-9_]+$", name), name
    # oracle keys are a subset of query keys
    assert set(registry.ORACLE) <= set(registry.QUERIES)
