

class TestBatchComparatorCache:
    def test_cached_pattern_state_matches_plain_calls(self):
        """BatchComparator pattern caching (reference Readme.md:100-106,
        jaro.rs:797) must be a pure perf optimization for every cached
        metric: same values as the one-shot surface."""
        import random

        from rapidfuzz_spark import api

        random.seed(21)
        pats = ["martha", "a" * 70 + "xyz", "пример текста", ""]
        texts = ["marhta", "a" * 70 + "xzy", "пример тенста", "x", ""]
        for name in ("indel", "lcs_seq", "jaro", "jaro_winkler"):
            mod = getattr(api, name)
            for p in pats:
                bc = mod.BatchComparator(p)
                for t in texts:
                    assert bc.distance(t) == mod.distance(p, t), (name, p, t)
                    assert bc.similarity(t) == mod.similarity(p, t)
                    assert bc.normalized_similarity(
                        t
                    ) == mod.normalized_similarity(p, t)
