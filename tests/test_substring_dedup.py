"""Exact-substring dedup tier — planted partial copies + brute-force parity."""

import random

import pytest
from pyspark.sql import functions as F

from deva_spark.functions.substring import (
    boilerplate_windows,
    substring_dup_pairs,
    window_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vocab_text(rng, n, vocab=200):
    return " ".join(f"w{rng.randrange(vocab)}" for _ in range(n))


def test_planted_partial_copy_found(spark):
    # doc 2 copies a 20-word span from doc 1 into otherwise-unrelated
    # text: a shared L-word run yields exactly L - W + 1 shared windows
    # when the surrounding text shares nothing
    rng = random.Random(7)
    span = " ".join(f"copy{i}" for i in range(20))
    d1 = _vocab_text(rng, 80) + " " + span + " " + _vocab_text(rng, 40)
    d2 = _vocab_text(rng, 30) + " " + span + " " + _vocab_text(rng, 90)
    d3 = _vocab_text(rng, 100)  # no copy
    out = substring_dup_pairs(
        _docs(spark, [(1, d1), (2, d2), (3, d3)]), window=8
    ).collect()
    got = {(r.id_a, r.id_b): r.n_common for r in out}
    assert (1, 2) in got
    # at least the span-interior windows (boundary windows may also
    # match if the random flanks collide, hence >=)
    assert got[(1, 2)] >= 20 - 8 + 1
    assert all(p == (1, 2) for p in got)


def test_ratio_tier_blind_spot_is_covered(spark):
    # the motivating case: a 12-word licence header in two long,
    # otherwise-disjoint docs — 3-gram jaccard is far below any sane
    # threshold, the substring tier still fires
    header = " ".join(f"lic{i}" for i in range(12))
    a = header + " " + " ".join(f"a{i}" for i in range(300))
    b = header + " " + " ".join(f"b{i}" for i in range(300))
    out = substring_dup_pairs(_docs(spark, [(1, a), (2, b)]), window=8).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}
    # jaccard over 3-grams for scale: shared 10 of ~610 → ~1.6%
    from deva_spark.functions.minhash import ngram_jaccard_pairs

    jac = ngram_jaccard_pairs(
        _docs(spark, [(1, a), (2, b)]), pct_threshold=30
    ).collect()
    assert jac == []


def test_short_doc_yields_no_windows(spark):
    # shorter than the window: empty array, no sequence(1, 0) reversal
    out = window_hashes(
        _docs(spark, [(1, "only three words"), (2, "a b c d e f g h")]),
        window=8,
    ).collect()
    assert {r.doc_id for r in out} == {2}
    assert len(out) == 1


def test_matches_bruteforce_reference(spark):
    # pseudo-random soup with a few planted overlaps == python reference
    rng = random.Random(42)
    W = 5
    texts = {}
    for i in range(1, 9):
        texts[i] = _vocab_text(rng, rng.randrange(20, 60), vocab=30)
    # plant: 6 copies 9 words of 5, 7 copies 9 words of 6
    texts[6] = texts[6] + " " + " ".join(texts[5].split()[3:12])
    texts[7] = " ".join(texts[6].split()[-9:]) + " " + texts[7]

    def wins(t):
        ws = t.lower().split()
        return {
            " ".join(ws[i : i + W]) for i in range(len(ws) - W + 1)
        }

    expected = {}
    for i in texts:
        for j in texts:
            if i < j:
                c = len(wins(texts[i]) & wins(texts[j]))
                if c:
                    expected[(i, j)] = c
    out = substring_dup_pairs(
        _docs(spark, sorted(texts.items())), window=W
    ).collect()
    got = {(r.id_a, r.id_b): r.n_common for r in out}
    assert got == expected
    assert (5, 6) in got and (6, 7) in got


def test_df_cap_drops_hot_windows_and_boilerplate_surfaces_them(spark):
    # one 8-word banner in EVERY doc: df_cap excises it from pair
    # generation; boilerplate_windows reports it at linear cost
    banner = " ".join(f"bn{i}" for i in range(8))
    rng = random.Random(3)
    rows = [(i, banner + " " + _vocab_text(rng, 40, vocab=500)) for i in range(1, 7)]
    capped = substring_dup_pairs(_docs(spark, rows), window=8, df_cap=3).collect()
    assert capped == []  # only the banner was shared, and it is hot
    uncapped = substring_dup_pairs(_docs(spark, rows), window=8).collect()
    assert len(uncapped) == 15  # all 6-choose-2 pairs share the banner
    hot = boilerplate_windows(_docs(spark, rows), window=8, min_docs=4).collect()
    assert len(hot) == 1
    assert hot[0].n_docs == 6 and hot[0].keep_id == 1


def test_min_common_threshold(spark):
    span = " ".join(f"s{i}" for i in range(10))  # 3 shared 8-windows
    rng = random.Random(9)
    a = _vocab_text(rng, 50) + " " + span
    b = span + " " + _vocab_text(rng, 50)
    docs = _docs(spark, [(1, a), (2, b)])
    assert len(substring_dup_pairs(docs, window=8, min_common=3).collect()) == 1
    assert substring_dup_pairs(docs, window=8, min_common=4).collect() == []


def test_staged_hashes_route_matches_inline(spark):
    rng = random.Random(11)
    span = " ".join(f"z{i}" for i in range(15))
    rows = [
        (1, _vocab_text(rng, 60) + " " + span),
        (2, span + " " + _vocab_text(rng, 60)),
        (3, _vocab_text(rng, 60)),
    ]
    docs = _docs(spark, rows)
    staged = window_hashes(docs, window=8).persist()
    try:
        via_staged = sorted(
            (r.id_a, r.id_b, r.n_common)
            for r in substring_dup_pairs(docs, hashes=staged, window=8).collect()
        )
        inline = sorted(
            (r.id_a, r.id_b, r.n_common)
            for r in substring_dup_pairs(docs, window=8).collect()
        )
        assert via_staged == inline and len(inline) == 1
    finally:
        staged.unpersist()


def test_longest_common_run_exact_length(spark):
    # an island of L shared windows certifies a run of exactly
    # L + window - 1 words — plant spans of known lengths and check
    # the reported word counts are exact
    from deva_spark.functions.substring import longest_common_run

    rng = random.Random(21)
    span17 = " ".join(f"c{i}" for i in range(17))
    span9 = " ".join(f"k{i}" for i in range(9))
    rows = [
        (1, _vocab_text(rng, 50) + " " + span17 + " " + _vocab_text(rng, 30)),
        # doc 2 shares the 17-word span AND a separate 9-word span —
        # run_words reports the LONGEST
        (2, span9 + " " + _vocab_text(rng, 40) + " " + span17),
        # doc 3 shares only the 9-word span
        (3, _vocab_text(rng, 60) + " " + span9),
    ]
    out = {
        (r.id_a, r.id_b): r.run_words
        for r in longest_common_run(_docs(spark, rows), window=5).collect()
    }
    assert out[(1, 2)] == 17
    assert out[(2, 3)] == 9
    assert (1, 3) not in out  # no shared 5-word run
    # min_run filters in words
    flt = longest_common_run(_docs(spark, rows), window=5, min_run=10).collect()
    assert {(r.id_a, r.id_b) for r in flt} == {(1, 2)}


def test_longest_common_run_matches_bruteforce(spark):
    # random soup with planted overlaps == python longest-common-
    # substring-at-word-level reference (dynamic programming)
    from deva_spark.functions.substring import longest_common_run

    rng = random.Random(33)
    W = 4
    texts = {i: _vocab_text(rng, rng.randrange(15, 40), vocab=12) for i in range(1, 7)}
    texts[5] = texts[5] + " " + " ".join(texts[4].split()[2:11])

    def lcs_words(a, b):
        aw, bw = a.lower().split(), b.lower().split()
        best = 0
        dp = [0] * (len(bw) + 1)
        for i in range(1, len(aw) + 1):
            prev = 0
            for j in range(1, len(bw) + 1):
                cur = dp[j]
                dp[j] = prev + 1 if aw[i - 1] == bw[j - 1] else 0
                best = max(best, dp[j])
                prev = cur
        return best

    expected = {}
    for i in texts:
        for j in texts:
            if i < j:
                L = lcs_words(texts[i], texts[j])
                if L >= W:
                    expected[(i, j)] = L
    out = {
        (r.id_a, r.id_b): r.run_words
        for r in longest_common_run(_docs(spark, sorted(texts.items())), window=W).collect()
    }
    assert out == expected
    assert (4, 5) in out and out[(4, 5)] >= 9


def test_longest_common_run_periodic_text(spark):
    # repeated periodic content: every window of A matches many
    # positions of B — diagonals keep the islands straight
    from deva_spark.functions.substring import longest_common_run

    a = " ".join(["p q r"] * 6)  # 18 words, period 3
    b = " ".join(["p q r"] * 4)  # 12 words
    out = longest_common_run(_docs(spark, [(1, a), (2, b)]), window=4).collect()
    # longest shared run == all of b (12 words), found on some diagonal
    assert len(out) == 1 and out[0].run_words == 12


def test_pair_plan_has_no_cartesian(spark):
    docs = _docs(spark, [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")])
    plan = (
        substring_dup_pairs(docs, window=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_remove_duplicate_runs_planted_span(spark):
    # 3 docs; docs 1 and 2 share a 20-word span — keeper (min doc_id,
    # doc 1) keeps everything, doc 2 loses exactly the 20 covered
    # words, doc 3 is untouched (but canonicalized: lowercase + single
    # spaces)
    from deva_spark.functions.substring import remove_duplicate_runs

    rng = random.Random(11)
    span = " ".join(f"dup{i}" for i in range(20))
    pre2, post2 = _vocab_text(rng, 30), _vocab_text(rng, 40)
    d1 = _vocab_text(rng, 60) + " " + span + " " + _vocab_text(rng, 25)
    d2 = pre2 + " " + span + " " + post2
    d3 = _vocab_text(rng, 50)
    out = {
        r.doc_id: r
        for r in remove_duplicate_runs(
            _docs(spark, [(1, d1), (2, d2), (3, d3)]), window=8
        ).collect()
    }
    assert out[1].n_removed == 0 and out[1].clean_text == d1.lower()
    assert out[2].n_removed == 20
    assert out[2].clean_text == (pre2 + " " + post2).lower()
    assert out[3].n_removed == 0 and out[3].clean_text == d3.lower()
    assert out[2].n_words == 30 + 20 + 40


def test_remove_duplicate_runs_cross_keeper(spark):
    # doc 1 is keeper for span A (loses span B), doc 2 is keeper for
    # span B (loses span A) — removal is per-window, not per-document
    from deva_spark.functions.substring import remove_duplicate_runs

    rng = random.Random(13)
    sa = " ".join(f"aa{i}" for i in range(12))
    sb = " ".join(f"bb{i}" for i in range(12))
    f1, f2, f3, f4 = (_vocab_text(rng, 20, vocab=500) for _ in range(4))
    # doc 1 has A then B; doc 2 has B then A; keeper is min doc_id per
    # WINDOW, so doc 1 keeps both (it contains both spans) — use 3 docs
    d1 = f1 + " " + sa
    d2 = f2 + " " + sb
    d3 = f3 + " " + sa + " " + f4 + " " + sb
    out = {
        r.doc_id: r
        for r in remove_duplicate_runs(
            _docs(spark, [(1, d1), (2, d2), (3, d3)]), window=8
        ).collect()
    }
    # doc 3 loses BOTH spans (keeper of A is doc 1, of B is doc 2)
    assert out[1].n_removed == 0 and out[2].n_removed == 0
    assert out[3].n_removed == 24
    assert out[3].clean_text == (f3 + " " + f4).lower()


def test_remove_duplicate_runs_matches_bruteforce(spark):
    # random soup with planted overlaps == a python reference that
    # replays the exact semantics (window mask -> covered positions)
    from deva_spark.functions.substring import remove_duplicate_runs

    rng = random.Random(17)
    W = 4
    texts = {i: _vocab_text(rng, rng.randrange(12, 30), vocab=10) for i in range(1, 8)}
    texts[6] = texts[6] + " " + " ".join(texts[3].split()[1:9])

    def reference(texts, w):
        toks = {i: t.lower().split() for i, t in texts.items()}
        occ = {}
        for i, tw in toks.items():
            for p in range(len(tw) - w + 1):
                occ.setdefault(tuple(tw[p : p + w]), {}).setdefault(i, []).append(p)
        cov = {i: set() for i in toks}
        for win, docs_ in occ.items():
            if len(docs_) < 2:
                continue
            keep = min(docs_)
            for i, ps in docs_.items():
                if i == keep:
                    continue
                for p in ps:
                    cov[i].update(range(p, p + w))
        return {
            i: (
                len(tw),
                len(cov[i]),
                " ".join(t for j, t in enumerate(tw) if j not in cov[i]),
            )
            for i, tw in toks.items()
        }

    exp = reference(texts, W)
    got = {
        r.doc_id: (r.n_words, r.n_removed, r.clean_text)
        for r in remove_duplicate_runs(
            _docs(spark, sorted(texts.items())), window=W
        ).collect()
    }
    assert got == exp
    assert any(v[1] > 0 for v in exp.values())  # the planted copy fired


def test_remove_duplicate_runs_staged_positions_route(spark):
    from deva_spark.functions.substring import (
        remove_duplicate_runs,
        window_hash_positions,
    )

    rng = random.Random(19)
    span = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, _vocab_text(rng, 30) + " " + span),
        (2, span + " " + _vocab_text(rng, 30)),
    ]
    docs = _docs(spark, rows)
    staged = window_hash_positions(docs, window=6).persist()
    try:
        a = sorted(map(tuple, remove_duplicate_runs(docs, window=6).collect()))
        b = sorted(
            map(
                tuple,
                remove_duplicate_runs(
                    docs, window=6, positions=staged
                ).collect(),
            )
        )
        assert a == b and a[1][2] > 0  # doc 2 lost the span
    finally:
        staged.unpersist()


def test_grouped_pairs_route_matches_join(spark):
    # the pair-ready grouped index (wh -> sorted doc array, x74's
    # staged route) must emit IDENTICAL pair rows to the self-join
    # formulation, including under df_cap
    from deva_spark.functions.substring import (
        substring_dup_pairs,
        substring_dup_pairs_from_groups,
        window_doc_groups,
    )

    rng = random.Random(23)
    span = " ".join(f"g{i}" for i in range(15))
    rows = [
        (1, _vocab_text(rng, 40, vocab=8)),
        (2, _vocab_text(rng, 40, vocab=8)),
        (3, _vocab_text(rng, 30, vocab=8) + " " + span),
        (4, span + " " + _vocab_text(rng, 30, vocab=8)),
    ]
    docs = _docs(spark, rows)
    groups = window_doc_groups(docs, window=4).persist()
    try:
        for cap in (None, 2):
            a = sorted(
                map(
                    tuple,
                    substring_dup_pairs(docs, window=4, df_cap=cap).collect(),
                )
            )
            b = sorted(
                map(
                    tuple,
                    substring_dup_pairs_from_groups(
                        groups, df_cap=cap
                    ).collect(),
                )
            )
            assert a == b and len(a) > 0, cap
    finally:
        groups.unpersist()


def test_incremental_pairs_matches_full_restricted(spark):
    # incremental (new-batch index vs staged corpus index) must equal
    # the full pair set restricted to pairs touching the batch — and
    # must contain NO old x old pair
    from deva_spark.functions.substring import (
        incremental_dup_pairs,
        substring_dup_pairs,
        window_hashes,
    )

    rng = random.Random(29)
    span = " ".join(f"inc{i}" for i in range(12))
    rows = [
        (1, _vocab_text(rng, 30, vocab=9)),
        (2, _vocab_text(rng, 30, vocab=9) + " " + span),
        (3, _vocab_text(rng, 25, vocab=9)),
        # "new batch"
        (4, span + " " + _vocab_text(rng, 20, vocab=9)),
        (5, _vocab_text(rng, 25, vocab=9)),
    ]
    docs = _docs(spark, rows)
    T = 4
    full = {
        (r.id_a, r.id_b): r.n_common
        for r in substring_dup_pairs(docs, window=4).collect()
    }
    expected = {p: c for p, c in full.items() if p[0] >= T or p[1] >= T}
    assert any(p[1] >= T and p[0] < T for p in expected)  # cross fired
    idx = window_hashes(docs, window=4).persist()
    try:
        got = {
            (r.id_a, r.id_b): r.n_common
            for r in incremental_dup_pairs(
                idx.filter(F.col("doc_id") >= T),
                idx.filter(F.col("doc_id") < T),
            ).collect()
        }
    finally:
        idx.unpersist()
    assert got == expected
    assert all(p[0] >= T or p[1] >= T for p in got)


def test_longest_common_run_grouped_route_parity(spark):
    # the pair-ready positioned group index (wh -> sorted (doc,pos)
    # array, x75's staged route) must emit IDENTICAL run lengths to
    # the position self-join formulation — including periodic text
    # (same-doc occurrence pairs are filtered in-array) and planted
    # shared spans across >2 docs
    from deva_spark.functions.substring import (
        longest_common_run,
        longest_common_run_from_groups,
        position_groups,
    )

    rng = random.Random(31)
    span = " ".join(f"s{i}" for i in range(12))
    rows = [
        (1, _vocab_text(rng, 40, vocab=8)),
        (2, _vocab_text(rng, 30, vocab=8) + " " + span),
        (3, span + " " + _vocab_text(rng, 30, vocab=8)),
        (4, "p q r s " * 6),  # periodic: every window repeats in-doc
        (5, "x y " + "p q r s " * 5),
    ]
    docs = _docs(spark, rows)
    groups = position_groups(docs, window=4).persist()
    try:
        a = sorted(
            map(tuple, longest_common_run(docs, window=4).collect())
        )
        b = sorted(
            map(
                tuple,
                longest_common_run_from_groups(groups, window=4).collect(),
            )
        )
        assert a == b and len(a) > 0
        # min_run filter agrees too
        af = sorted(
            map(tuple, longest_common_run(docs, window=4, min_run=12).collect())
        )
        bf = sorted(
            map(
                tuple,
                longest_common_run_from_groups(
                    groups, window=4, min_run=12
                ).collect(),
            )
        )
        assert af == bf
        # df_cap drops hot windows but never invents or inflates runs
        capped = {
            (r.id_a, r.id_b): r.run_words
            for r in longest_common_run_from_groups(
                groups, window=4, df_cap=3
            ).collect()
        }
        full = dict(((r[0], r[1]), r[2]) for r in b)
        for pair, rw in capped.items():
            assert full[pair] >= rw
    finally:
        groups.unpersist()


def test_pruned_dup_window_index_route_matches_full(spark):
    # subwin8d (VERDICT r9 #6): the >=2-doc prune drops only whs that
    # cannot form a pair, so incremental_dup_pairs over the pruned index
    # must equal the full-index result for ANY batch split.
    import string

    from deva_spark.functions.substring import (
        incremental_dup_pairs,
        window_hashes,
    )

    random.seed(11)
    words = ["".join(random.choices(string.ascii_lowercase, k=4)) for _ in range(60)]
    texts = []
    for i in range(20):
        body = random.choices(words, k=30)
        if i % 5 == 0 and i:  # plant shared 12-word spans
            body[3:15] = texts[0].split()[3:15]
        texts.append(" ".join(body))
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    idx = window_hashes(docs, window=8).persist()
    idx.count()
    cnt = idx.groupBy("wh").agg(F.count(F.lit(1)).alias("c")).filter("c >= 2")
    pruned = idx.join(cnt.select("wh"), "wh")
    bp = F.col("doc_id") % 10 == 0
    full = sorted(
        tuple(r)
        for r in incremental_dup_pairs(idx.filter(bp), idx.filter(~bp)).collect()
    )
    slim = sorted(
        tuple(r)
        for r in incremental_dup_pairs(
            pruned.filter(bp), pruned.filter(~bp)
        ).collect()
    )
    assert full == slim and len(full) > 0
    idx.unpersist()
