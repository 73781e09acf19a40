

def test_right_maximal_repeats_vs_brute(spark):
    from collections import defaultdict

    from etl_market_survey_spark.operators.suffixarray import (
        right_maximal_repeats,
    )

    texts = [
        (0, "abcabcabd"),
        (1, "aaaa"),
        (2, "xy"),
        (3, "key agg key agg row"),
    ]

    def brute(t, min_len, max_len):
        out = {}
        n = len(t)
        for L in range(min_len, min(max_len, n) + 1):
            groups = defaultdict(list)
            for p in range(n - L + 1):
                groups[t[p : p + L]].append(p)
            for s, ps in groups.items():
                if len(ps) >= 2 and len({t[p + L : p + L + 1] for p in ps}) >= 2:
                    out[s] = len(ps)
        return out

    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = defaultdict(dict)
    for r in right_maximal_repeats(df, min_len=1, max_len=50).collect():
        got[r["doc_id"]][r["repeat"]] = r["n_occ"]
    for doc_id, t in texts:
        assert got.get(doc_id, {}) == brute(t, 1, 50), (doc_id, t)
