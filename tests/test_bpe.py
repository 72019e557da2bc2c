"""Corpus-trained BPE (r14): Sennrich reference behavior, greedy-overlap
merge semantics, deterministic tie-breaks, token counting."""

import pytest
from pyspark.sql import functions as F

from deva_spark.functions import bpe


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_sennrich_reference_corpus(spark):
    # the ACL-2016 paper's worked example family: 'low/lower/newest/
    # widest' — the first merges must fuse the most frequent adjacent
    # pair with deterministic tie-breaks
    docs = _corpus(
        spark,
        ["low low low low low", "lower lower", "newest newest newest "
         "newest newest newest", "widest widest widest"],
    )
    words = bpe.word_counts(docs)
    merges, final = bpe.train_bpe(words, 10)
    assert [m[:3] for m in merges][:4] == [
        # est</w> dominates: newest(6)+widest(3) = 9 occurrences
        (0, "e", "s"),
        (1, "es", "t"),
        (2, "est", "</w>"),
        (3, "l", "o"),
    ]
    segs = {r.word: r.seg for r in final.collect()}
    assert segs["newest"] == "newest</w>"  # fully fused by merge 7
    assert segs["low"] == "low</w>"
    assert segs["lower"] == "low e r </w>"
    assert segs["widest"] == "w i dest</w>"


def test_greedy_overlap_semantics(spark):
    # 'a a a' + merge (a,a) -> 'aa a' (left-to-right greedy), the
    # semantics the double-space replace algebra must reproduce
    docs = _corpus(spark, ["aaa aaa"])
    words = bpe.word_counts(docs)
    merges, final = bpe.train_bpe(words, 1)
    assert merges[0][1:3] == ("a", "a")
    assert {r.seg for r in final.collect()} == {"aa a </w>"}


def test_tiebreak_is_freq_then_lexicographic(spark):
    # 'xy' and 'ab' both appear twice: (a,b) wins on lhs order
    docs = _corpus(spark, ["xy ab", "ab xy"])
    words = bpe.word_counts(docs)
    merges, _ = bpe.train_bpe(words, 1)
    step, lhs, rhs, freq = merges[0]
    assert (lhs, rhs) == ("a", "b") and freq == 2


def test_word_counts_normalization(spark):
    docs = _corpus(spark, ["The  quick-BROWN fox! fox", None, "123 fox"])
    rows = {r.word: (r.freq, r.seg) for r in bpe.word_counts(docs).collect()}
    assert rows["fox"] == (3, "f o x </w>")
    assert rows["the"][0] == 1 and "123" not in rows
    assert rows["quick"][0] == 1 and rows["brown"][0] == 1


def test_token_counts_price_trained_tokens(spark):
    docs = _corpus(spark, ["low low newest", "newest widest", "low"])
    words = bpe.word_counts(docs)
    _, final = bpe.train_bpe(words, 6)
    got = {
        r.doc_id: r.n_tokens
        for r in bpe.token_counts(docs, final).collect()
    }
    segs = {r.word: len(r.seg.split(" ")) for r in final.collect()}
    assert got == {
        0: 2 * segs["low"] + segs["newest"],
        1: segs["newest"] + segs["widest"],
        2: segs["low"],
    }


def test_train_validation_and_degenerate_corpus(spark):
    docs = _corpus(spark, ["a a a"])
    words = bpe.word_counts(docs)
    with pytest.raises(ValueError, match="n_merges"):
        bpe.train_bpe(words, 0)
    # 'a </w>' fuses in one merge; later rounds find no pairs and stop
    merges, final = bpe.train_bpe(words, 5)
    assert [m[1:3] for m in merges] == [("a", "</w>")]
    assert final.collect()[0].seg == "a</w>"


def test_merges_df_schema(spark):
    df = bpe.merges_df(spark, [(0, "a", "b", 3)])
    assert df.schema.simpleString() == (
        "struct<step:int,lhs:string,rhs:string,freq:bigint>"
    )
    assert df.collect()[0].freq == 3


def test_apply_merges_matches_training_and_handles_unseen(spark):
    # deployment half: applying the trained table to words the trainer
    # SAW reproduces the training segmentation exactly; unseen words
    # segment deterministically (merges apply where pairs exist,
    # character fallback otherwise)
    docs = _corpus(spark, ["low low low lower newest newest widest"])
    words = bpe.word_counts(docs)
    merges, final = bpe.train_bpe(words, 8)
    trained = {r.word: r.seg for r in final.collect()}
    applied = {
        r.word: r.seg
        for r in bpe.apply_merges(
            words.select("word"), merges
        ).collect()
    }
    assert applied == trained
    unseen = spark.createDataFrame(
        [("lowest",), ("zq",)], "word string"
    )
    got = {r.word: r.seg for r in bpe.apply_merges(unseen, merges).collect()}
    # 'lowest' reuses the learned 'low' and 'est'-family merges;
    # 'zq' has no trained pairs and stays characters
    assert got["zq"] == "z q </w>"
    assert "low" in got["lowest"].split(" ")[0]


def test_batch_token_counts_no_corpus_access(spark):
    docs = _corpus(spark, ["low newest", "zq zq unknownword"])
    train = _corpus(spark, ["low low newest newest widest"])
    merges, _ = bpe.train_bpe(bpe.word_counts(train), 6)
    got = {
        r.doc_id: r.n_tokens
        for r in bpe.batch_token_counts(docs, merges).collect()
    }
    seg = {
        r.word: len(r.seg.split(" "))
        for r in bpe.apply_merges(
            spark.createDataFrame(
                [("low",), ("newest",), ("zq",), ("unknownword",)],
                "word string",
            ),
            merges,
        ).collect()
    }
    assert got == {
        0: seg["low"] + seg["newest"],
        1: 2 * seg["zq"] + seg["unknownword"],
    }


def test_oracle_parity_on_degenerate_early_stop_corpus(spark):
    # review r14: a corpus that fuses completely before round 12 made
    # the old cross-join oracle empty every later w{k} while train_bpe
    # kept the final segmentation. The LEFT JOIN fallback restores
    # parity — proven here by running the REAL x120/x121 oracle SQL in
    # DuckDB against a degenerate corpus and comparing to the Spark
    # pipeline on the same rows.
    import duckdb
    import pandas as pd

    from deva_spark.queries.curation import (
        _BPE_N,
        _X120_ORACLE,
        _X121_ORACLE,
    )

    texts = ["ab ab ab", "ab ab", "ab"]  # fuses in 3 merges
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    docs = _corpus(spark, texts)
    words = bpe.word_counts(docs)
    merges, final = bpe.train_bpe(words, _BPE_N)
    assert len(merges) < _BPE_N  # genuinely degenerate (early stop)

    om = con.execute(_X120_ORACLE).fetchall()
    assert [(r[0], r[1], r[2], r[3]) for r in om] == merges

    ot = dict(con.execute(_X121_ORACLE).fetchall())
    got = {
        r.doc_id: r.n_tokens
        for r in bpe.token_counts(docs, final).collect()
    }
    assert got == ot and got == {0: 3, 1: 2, 2: 1}  # fully fused: ab</w>


def test_driver_and_distributed_paths_agree(spark):
    """The adaptive small-vocabulary cutover (r14 optimization pass)
    must be invisible: merge table AND final segmentations identical
    whether the loop runs driver-side (default at test scale) or
    distributed (forced via driver_threshold=0) — the
    connected_components cutover contract."""
    from deva_spark.functions import bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low lower lowest", "new newer newest", "wide wider widest",
             "low low new wide", None, ""]
        )],
        "doc_id long, text string",
    )
    words = bpe.word_counts(docs)
    m_drv, f_drv = bpe.train_bpe(words, 8)
    m_dist, f_dist = bpe.train_bpe(words, 8, driver_threshold=0)
    assert m_drv == m_dist
    assert sorted(map(tuple, f_drv.collect())) == sorted(
        map(tuple, f_dist.collect())
    )
