"""Text metrics + similarity/dedup + ANN + relational extensions
(x01-x32), plus the staged-directory helpers later tiers reuse.

Token counts, lang-id, quality scores, fingerprints (x01-x04); n-gram
Jaccard, MinHash-LSH, SimHash, exact cosine top-k, hyperplane-LSH and
IVF ANN (x05-x09, x23, x32); TF-IDF, full-text search (x12-x13);
TPC-H-ish extensions — brand stats, cube, analytic windows, range-band
and as-of joins, histograms, pivots (x16-x27); BPE tokens, rolling
hashes, take-while, ordered pairs (x28-x31).
"""

from __future__ import annotations

from deva_spark.functions import minhash as mh
from deva_spark.functions import simhash as sh
from deva_spark.functions import text as T
from deva_spark.functions import vectors as V
from deva_spark.operators import aggregates as agg
from deva_spark.operators import joins
from deva_spark.operators import windows
from deva_spark.operators.aggregates import money_sum
from deva_spark.operators.aggregates import round_money
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
import os as _os
from deva_spark.session import read_parquet
from deva_spark.queries._infra import (
    ORACLE_SQL,
    _doc_index,
    _doc_signatures,
    _jaccard_pairs,
    _session_cache,
    _shared_artifact,
    _t,
    query,
    staged_artifact_path,
)
from deva_spark.queries.declared import _STOPS_SQL

@query(
    "x01_token_count",
    r"""SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents ORDER BY doc_id""",
)
def x01(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )


@query(
    "x02_lang_id",
    rf"""SELECT doc_id,
            CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                      w -> w IN {_STOPS_SQL})) * 100
                     >= len(regexp_split_to_array(trim(text), '\s+')) * 15
                 THEN 'en' ELSE 'other' END AS lang_pred
        FROM documents ORDER BY doc_id""",
)
def x02(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", T.lang_id(F.col("text")).alias("lang_pred")
    )


@query(
    "x03_quality_score",
    rf"""SELECT doc_id,
            ROUND((CASE WHEN LENGTH(text) BETWEEN 50 AND 5000 THEN 30 ELSE 0 END)
                + (CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                             w -> w IN {_STOPS_SQL})) * 10
                        >= len(regexp_split_to_array(trim(text), '\s+')) THEN 40 ELSE 0 END)
                + (CASE WHEN LENGTH(text) > 0
                        THEN 30.0 * (1.0 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                                            / CAST(LENGTH(text) AS DOUBLE))
                        ELSE 0.0 END), 2) AS score
        FROM documents ORDER BY doc_id""",
)
def x03(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", T.quality_score(F.col("text")).alias("score")
    )


@query(
    "x04_fingerprint",
    r"""SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id""",
)
def x04(spark, sf):
    return _t(spark, sf, "documents").select(
        "doc_id", T.fingerprint(F.col("text")).alias("fp")
    )


@query(
    "x05_ngram_jaccard",
    r"""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
          FROM words WHERE len(ws) >= 3
        ), ex AS (
          SELECT doc_id, UNNEST(shingles) AS s FROM sh
        ), sizes AS (
          SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id
        ), common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
          FROM ex a JOIN ex b USING (s) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               ROUND(CAST(common AS DOUBLE) / CAST(na.n + nb.n - common AS DOUBLE), 4) AS jaccard
        FROM common
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE common * 100 >= (na.n + nb.n - common) * 30
        ORDER BY id_a, id_b""",
)
def x05(spark, sf):
    return _jaccard_pairs(spark, sf)


@query(
    "x06_minhash_lsh_neardup",
    r"""WITH words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents
        ), sh AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS shingles
          FROM words WHERE len(ws) >= 3
        ), hs AS (
          SELECT doc_id,
                 list_transform(shingles, s ->
                     [CAST(md5_number_upper(s) AS HUGEINT) % 2305843009213693951,
                      CAST(md5_number_lower(s) AS HUGEINT) % 2305843009213693951]) AS hs
          FROM sh
        ), sig AS (
          SELECT doc_id,
                 list_transform(range(0, 12),
                     j -> CAST(list_min(list_transform(hs,
                              h -> (h[1] + j * h[2]) % 2305843009213693951)) AS BIGINT)) AS sig
          FROM hs
        ), bands AS (
          SELECT doc_id, b,
                 md5(CAST(sig[b*3+1] AS VARCHAR) || '|' || CAST(sig[b*3+2] AS VARCHAR)
                     || '|' || CAST(sig[b*3+3] AS VARCHAR)) AS bkey
          FROM sig, range(0, 4) t(b)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
          FROM bands a JOIN bands b2 USING (b, bkey)
          WHERE a.doc_id < b2.doc_id
        ), scored AS (
          SELECT id_a, id_b,
                 len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) AS n_match
          FROM cand
          JOIN sig sa ON sa.doc_id = id_a
          JOIN sig sb ON sb.doc_id = id_b
        )
        SELECT id_a, id_b, CAST(ROUND(n_match / 12.0, 4) AS DOUBLE) AS est_sim
        FROM scored WHERE n_match >= 6 ORDER BY id_a, id_b""",
)
def x06(spark, sf):
    # staged neardup_pairs artifact IS this query's answer table (the
    # x05/jaccard_pairs precedent); unstaged runs the LSH pass off the
    # shared signature table.
    staged = staged_artifact_path(sf, "neardup_pairs")
    if staged:
        return read_parquet(spark, staged).select("id_a", "id_b", "est_sim")
    docs = _t(spark, sf, "documents").filter(F.size(T.words(F.col("text"))) >= 3)
    return mh.near_duplicates(docs, min_matches=6, sigs=_doc_signatures(spark, sf))


@query(
    "x07_simhash_neardup",
    r"""WITH w AS (
          SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS word
          FROM documents
        ), wh AS (
          SELECT doc_id, substr(md5(word), 1, 12) AS hx FROM w
        ), bits AS (
          SELECT doc_id, b,
                 SUM(CASE WHEN CAST(floor((strpos('0123456789abcdef',
                          substr(hx, CAST(floor((47 - b) / 4) AS INT) + 1, 1)) - 1)
                          / power(2, b % 4)) AS BIGINT) % 2 = 1
                     THEN 1 ELSE -1 END) AS vote
          FROM wh, range(0, 48) t(b) GROUP BY doc_id, b
        ), fp AS (
          SELECT doc_id,
                 SUM(CASE WHEN vote > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS fp
          FROM bits GROUP BY doc_id
        ), chunks AS (
          SELECT doc_id, fp, ci,
                 CAST(floor(fp / power(2, ci * 12)) AS BIGINT) % 4096 AS cv
          FROM fp, range(0, 4) t(ci)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, a.fp AS fp_a, b2.doc_id AS id_b, b2.fp AS fp_b
          FROM chunks a JOIN chunks b2 USING (ci, cv)
          WHERE a.doc_id < b2.doc_id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hd
        FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= 3 ORDER BY id_a, id_b""",
)
def x07(spark, sf):
    # staged simhash_fps artifact feeds the banding/verify joins (the
    # doc_sigs pattern); unstaged computes + persists fingerprints here.
    staged = staged_artifact_path(sf, "simhash_fps")
    fps = read_parquet(spark, staged) if staged else None
    return sh.near_duplicates(
        _t(spark, sf, "documents"), max_hamming=3, fps=fps
    ).select("id_a", "id_b", F.col("hd").cast("bigint").alias("hd"))


@query(
    "x08_cosine_topk",
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id, embedding AS ce FROM embeddings),
            s AS (
              SELECT qid, vec_id,
                     ROUND(list_sum(list_transform(range(1, len(qe) + 1),
                               i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE)))
                           / (sqrt(list_sum(list_transform(range(1, len(qe) + 1),
                               i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))
                            * sqrt(list_sum(list_transform(range(1, len(ce) + 1),
                               i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))))), 4) AS cos
              FROM q, c WHERE vec_id <> qid
            ), r AS (
              SELECT qid, vec_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
              FROM s)
       SELECT qid, vec_id, cos, rnk FROM r WHERE rnk <= 5 ORDER BY qid, rnk""",
)
def x08(spark, sf):
    # EXACT cosine top-k per query vector — the deliberate brute-force
    # recall baseline the ANN tiers (x09 LSH, x32 IVF, x101-x103 IVF-PQ)
    # are measured against. Broadcast queries over the candidate scan,
    # then the salted TWO-PHASE rank (VERDICT r10 #3, r11): per-(qid,
    # _salt) local top-k before the per-qid window, so no reducer's
    # input scales with the corpus under a fixed query count; an
    # adaptive small-input cutover takes the plain window below 128 MiB
    # (`vectors.brute_force_topk`).
    emb = _t(spark, sf, "embeddings")
    return V.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _x09_oracle() -> str:
    """Generate the DuckDB twin of the multi-table hyperplane LSH: the
    planes are deterministic (LCG, seed 42), so the oracle embeds them as
    literal rows and reproduces bucket assignment, candidate generation,
    and exact rescoring. Sign-of-dot is robust to summation-order float
    differences (a dot product within 1e-15 of zero never occurs here),
    so numpy-matmul buckets and SQL list_sum buckets agree."""
    from deva_spark.functions.vectors import deterministic_planes

    n_planes, n_tables, dim = 4, 8, 64
    planes = deterministic_planes(dim, n_planes * n_tables)
    rows = ",\n".join(
        f"({t}, {p}, [{', '.join(repr(v) for v in planes[t * n_planes + p])}])"
        for t in range(n_tables)
        for p in range(n_planes)
    )
    return f"""WITH planes(t, p, w) AS (VALUES
{rows}
        ), vec AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ), signs AS (
          SELECT v.vec_id, pl.t, pl.p,
                 CASE WHEN list_sum(list_transform(range(1, 65),
                          i -> v.e[i] * pl.w[i])) >= 0
                      THEN CAST(power(2, pl.p) AS BIGINT) ELSE 0 END AS bit
          FROM vec v CROSS JOIN planes pl
        ), buckets AS (
          SELECT vec_id, t, SUM(bit) AS b FROM signs GROUP BY vec_id, t
        ), qb AS (SELECT vec_id AS qid, t, b FROM buckets WHERE vec_id < 10),
        cand AS (
          SELECT DISTINCT qb.qid, cb.vec_id
          FROM buckets cb JOIN qb USING (t, b)
          WHERE cb.vec_id <> qb.qid
        ), scored AS (
          SELECT c.qid, c.vec_id,
                 ROUND(list_sum(list_transform(range(1, 65), i -> q.e[i] * v.e[i]))
                       / (sqrt(list_sum(list_transform(range(1, 65), i -> q.e[i] * q.e[i])))
                        * sqrt(list_sum(list_transform(range(1, 65), i -> v.e[i] * v.e[i])))), 4) AS cos
          FROM cand c
          JOIN vec q ON q.vec_id = c.qid
          JOIN vec v ON v.vec_id = c.vec_id
        ), r AS (
          SELECT qid, vec_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
          FROM scored)
        SELECT qid, vec_id, cos, rnk FROM r WHERE rnk <= 5 ORDER BY qid, rnk"""


@query("x09_ann_lsh_topk", None)  # oracle attached below (generated)
def x09(spark, sf):
    # Single-pass LSH ANN (r8): driver-side query buckets + one
    # mapInPandas bucket-match/rescore/partial-top-k over the vectors,
    # bounded global merge — identical results to the join formulation
    # (parity-tested), ~3x faster and ONE bounded shuffle instead of
    # three data-sized ones. The r7 staged-bucket-table experiment
    # stayed reverted (ROUND7_NOTES: measured slower); this is the
    # different cut that worked.
    emb = _t(spark, sf, "embeddings")
    return V.lsh_topk_onepass(emb, emb.filter(F.col("vec_id") < 10), k=5)


ORACLE_SQL["x09_ann_lsh_topk"] = _x09_oracle()


@query(
    "x10_label_centroids",
    """SELECT label, i, ROUND(AVG(v), 6) AS m FROM (
         SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
         FROM embeddings, range(1, 65) t(i)) u
       GROUP BY label, i ORDER BY label, i""",
)
def x10(spark, sf):
    # IVF coarse-quantizer building block: per-label mean vector, flat rows.
    emb = _t(spark, sf, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("i0", "v")
    ).select("label", (F.col("i0") + 1).alias("i"), F.col("v").cast("double").alias("v"))
    return (
        exploded.groupBy("label", "i")
        .agg(F.round(F.avg("v"), 6).alias("m"))
    )


@query(
    "x11_json_extract",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
       FROM events ORDER BY event_id""",
)
def x11(spark, sf):
    return _t(spark, sf, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@query(
    "x12_tfidf_keywords",
    r"""WITH idx AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM (
            SELECT doc_id, UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
            FROM documents) t
          WHERE LENGTH(term) > 0 GROUP BY doc_id, term
        ), dfq AS (
          SELECT term, COUNT(*) AS df FROM idx GROUP BY term
        ), nd AS (SELECT COUNT(*) AS n FROM documents)
        SELECT doc_id, term, ROUND(w, 6) AS w, rnk FROM (
          SELECT idx.doc_id, idx.term,
                 (1.0 + ln(idx.tf)) * ln((nd.n + 1.0) / (dfq.df + 1.0)) AS w,
                 ROW_NUMBER() OVER (PARTITION BY idx.doc_id
                                    ORDER BY (1.0 + ln(idx.tf)) * ln((nd.n + 1.0) / (dfq.df + 1.0)) DESC,
                                             idx.term) AS rnk
          FROM idx JOIN dfq USING (term) CROSS JOIN nd) t
        WHERE rnk <= 5 ORDER BY doc_id, rnk""",
)
def x12(spark, sf):
    # jieba-TFIDF keyword extraction analog (search.py:179-207); shares the
    # materialized posting table with x13 (IndexStream: build once, query
    # many).
    from deva_spark.functions.search import keywords_tfidf

    docs = _t(spark, sf, "documents")
    return keywords_tfidf(docs, top_n=5, index=_doc_index(spark, sf)).select(
        "doc_id", "term", F.round("w", 6).alias("w"), "rnk"
    )


@query(
    "x13_fulltext_search",
    r"""WITH idx AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM (
            SELECT doc_id, UNNEST(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
            FROM documents) t
          WHERE LENGTH(term) > 0 GROUP BY doc_id, term
        ), dfq AS (
          SELECT term, COUNT(*) AS df FROM idx GROUP BY term
        ), nd AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT idx.doc_id,
                 ROUND(SUM((1.0 + ln(idx.tf)) * ln((nd.n + 1.0) / (dfq.df + 1.0))), 6) AS score,
                 COUNT(*) AS n_matched
          FROM idx JOIN dfq USING (term) CROSS JOIN nd
          WHERE idx.term IN ('spark', 'table')
          GROUP BY idx.doc_id)
        SELECT doc_id, score FROM scored WHERE n_matched = 2
        ORDER BY score DESC, doc_id LIMIT 10""",
)
def x13(spark, sf):
    # IndexStream search analog (search.py:18-256): AND-semantics TF-IDF
    # over the shared materialized posting table.
    from deva_spark.functions.search import search

    docs = _t(spark, sf, "documents")
    return search(_doc_index(spark, sf), docs, "spark table", top_k=10, require_all=True)


@query(
    "x14_case_route",
    """SELECT route, COUNT(*) AS c FROM (
         SELECT CASE WHEN value >= 50 THEN 'high'
                     WHEN value >= 10 THEN 'medium'
                     ELSE 'other' END AS route
         FROM events) t GROUP BY route ORDER BY route""",
)
def x14(spark, sf):
    # route/priority dispatch analog (core.py:1064-1102) as CASE routing.
    from deva_spark.operators.routing import case_route

    ev = case_route(
        _t(spark, sf, "events"),
        {"high": F.col("value") >= 50, "medium": F.col("value") >= 10},
    )
    return ev.groupBy("route").agg(F.count(F.lit(1)).alias("c"))


@query(
    "x15_corpus_curation",
    rf"""WITH base AS (
          SELECT doc_id, text,
                 ROUND((CASE WHEN LENGTH(text) BETWEEN 50 AND 5000 THEN 30 ELSE 0 END)
                     + (CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                                  w -> w IN {_STOPS_SQL})) * 10
                             >= len(regexp_split_to_array(trim(text), '\s+')) THEN 40 ELSE 0 END)
                     + (CASE WHEN LENGTH(text) > 0
                             THEN 30.0 * (1.0 - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                                                / CAST(LENGTH(text) AS DOUBLE))
                             ELSE 0.0 END), 2) AS q,
                 CASE WHEN len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                           w -> w IN {_STOPS_SQL})) * 100
                          >= len(regexp_split_to_array(trim(text), '\s+')) * 15
                      THEN 'en' ELSE 'other' END AS lang_pred,
                 len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM documents
        ), gated AS (
          SELECT * FROM base WHERE q >= 40 AND lang_pred = 'en'
        ), exact AS (
          SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) rn
                         FROM gated) t WHERE rn = 1
        ), words AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM exact
        ), sh AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS shingles
          FROM words WHERE len(ws) >= 3
        ), hs AS (
          SELECT doc_id,
                 list_transform(shingles, s ->
                     [CAST(md5_number_upper(s) AS HUGEINT) % 2305843009213693951,
                      CAST(md5_number_lower(s) AS HUGEINT) % 2305843009213693951]) AS hs
          FROM sh
        ), sig AS (
          SELECT doc_id,
                 list_transform(range(0, 12),
                     j -> CAST(list_min(list_transform(hs,
                              h -> (h[1] + j * h[2]) % 2305843009213693951)) AS BIGINT)) AS sig
          FROM hs
        ), bands AS (
          SELECT doc_id, b,
                 md5(CAST(sig[b*3+1] AS VARCHAR) || '|' || CAST(sig[b*3+2] AS VARCHAR)
                     || '|' || CAST(sig[b*3+3] AS VARCHAR)) AS bkey
          FROM sig, range(0, 4) t(b)
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
          FROM bands a JOIN bands b2 USING (b, bkey)
          WHERE a.doc_id < b2.doc_id
        ), drops AS (
          SELECT DISTINCT id_b AS doc_id FROM cand
          JOIN sig sa ON sa.doc_id = id_a
          JOIN sig sb ON sb.doc_id = id_b
          WHERE len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) >= 6
        )
        SELECT e.doc_id, e.n_tokens FROM exact e
        LEFT JOIN drops d ON e.doc_id = d.doc_id
        WHERE d.doc_id IS NULL ORDER BY e.doc_id""",
)
def x15(spark, sf):
    # The full north-star curation funnel (plans/corpus.py): quality/lang
    # gate -> exact dedup -> MinHash-LSH near-dup removal -> token counts.
    # With the doc_stats artifact staged (bench stages it), the funnel is
    # pure relational work over two staged tables — stats are exact
    # per-doc functions, so both routes produce identical rows and share
    # the oracle. Unstaged: the self-contained raw-text funnel.
    staged_stats = staged_artifact_path(sf, "doc_stats")
    if staged_stats:
        from deva_spark.plans.corpus import curate_from_stats

        staged_pairs = staged_artifact_path(sf, "neardup_pairs")
        return curate_from_stats(
            read_parquet(spark, staged_stats),
            sigs=None if staged_pairs else _doc_signatures(spark, sf),
            min_quality=40.0,
            lang="en",
            pairs=read_parquet(spark, staged_pairs) if staged_pairs else None,
        ).select("doc_id", "n_tokens")
    from deva_spark.plans.corpus import curate

    curated, _ = curate(
        _t(spark, sf, "documents"),
        min_quality=40.0,
        lang="en",
        with_report=False,
        sigs=_doc_signatures(spark, sf),
    )
    return curated.select("doc_id", "n_tokens")


@query(
    "x16_part_brand_stats",
    """SELECT p_brand, COUNT(*) AS c,
              CAST((2 * SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)) + COUNT(*))
                   // (2 * COUNT(*)) AS DOUBLE) / 100.0 AS avg_price,
              MAX(p_size) AS max_size
       FROM part GROUP BY 1 ORDER BY 1""",
)
def x16(spark, sf):
    # exact integer-cents average (see q04) — no float sum-order dependency
    return (
        _t(spark, sf, "part")
        .withColumn("_cents", F.round(F.col("p_retailprice") * 100, 0).cast("bigint"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("c"),
            (
                F.expr("(2 * sum(_cents) + count(*)) div (2 * count(*))").cast("double")
                / F.lit(100.0)
            ).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


@query(
    "x17_supplier_by_nation",
    """SELECT n_name, COUNT(*) AS c,
              CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS bal
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       GROUP BY 1 ORDER BY 1""",
)
def x17(spark, sf):
    return (
        _t(spark, sf, "supplier")
        .transform(
            joins.enrich(
                _t(spark, sf, "nation"), on=F.expr("s_nationkey = n_nationkey"), how="inner"
            )
        )
        .transform(
            agg.group_agg(
                ["n_name"],
                {
                    "c": F.count(F.lit(1)),
                    "bal": round_money(money_sum(F.col("s_acctbal"))),
                },
            )
        )
    )


@query(
    "x18_lineitem_part_join",
    """SELECT p_brand, COUNT(*) AS c,
              CAST(SUM(l_quantity) AS BIGINT) AS sq
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY 1 ORDER BY 1""",
)
def x18(spark, sf):
    # fact-to-dim: part broadcast, lineitem never shuffles before the
    # (tiny) brand aggregation.
    return (
        _t(spark, sf, "lineitem")
        .transform(
            joins.enrich(
                _t(spark, sf, "part"), on=F.expr("l_partkey = p_partkey"), how="inner"
            )
        )
        .transform(
            agg.group_agg(
                ["p_brand"],
                {
                    "c": F.count(F.lit(1)),
                    "sq": F.sum("l_quantity").cast("bigint"),
                },
            )
        )
    )


@query(
    "x19_cube",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
              CAST(SUM(l_quantity) AS BIGINT) AS sq
       FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
       ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""",
)
def x19(spark, sf):
    # grouping-sets upgrade beyond rollup (q32): full cube.
    return (
        _t(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("l_quantity").cast("bigint").alias("sq"),
        )
    )


@query(
    "x20_analytic_functions",
    """SELECT event_id,
              NTILE(4) OVER w AS quartile,
              ROUND(PERCENT_RANK() OVER w, 6) AS pr,
              ROUND(CUME_DIST() OVER w, 6) AS cd
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
       ORDER BY event_id""",
)
def x20(spark, sf):
    # analytic-function family (free in Spark; absent in the reference):
    # exact integer-ratio statistics, deterministic via the event_id
    # tie-break.
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return _t(spark, sf, "events").select(
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "x21_rolling_time_window",
    """SELECT event_id,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(30,6)))
                     OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS roll_1h
       FROM events ORDER BY event_id""",
)
def x21(spark, sf):
    # trailing-1-hour rolling sum per user (time-range frame over exact
    # integer microseconds; DECIMAL sum for order-independence).
    return (
        _t(spark, sf, "events")
        .transform(
            windows.rolling_time_agg(
                F.sum(F.col("value").cast(agg.MONEY)),
                out="roll_1h",
                seconds=3600,
                partition="user_id",
            )
        )
        .select("event_id", F.round("roll_1h", 2).cast("double").alias("roll_1h"))
    )


@query(
    "x22_range_band_join",
    """SELECT e.event_id, b.band FROM events e
       LEFT JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 50.0), ('high', 50.0, 1e9))
                 AS b(band, lo, hi)
         ON e.value >= b.lo AND e.value < b.hi
       ORDER BY e.event_id""",
)
def x22(spark, sf):
    # range/theta join: value-band assignment via broadcast range join.
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 50.0), ("high", 50.0, 1e9)],
        "band string, lo double, hi double",
    )
    return joins.range_band_join(_t(spark, sf, "events"), bands, "value").select(
        "event_id", "band"
    )


# ---------------------------------------------------------------------------
# Entry flagship
# ---------------------------------------------------------------------------


def _x23_oracle(
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
    restrict: str = "",
) -> str:
    """DuckDB twin of the LSH-prefiltered cosine near-dup pair join: same
    deterministic planes, same bucket self-join, same sequential-fold
    exact rescore (list_sum == left-to-right fold). ``restrict``: extra
    predicate on the final pair set — the x88 registration passes the
    batch-touching restriction (``"AND (id_a % 10 = 0 OR id_b % 10 =
    0)"``, the modular-arrival recipe on vectors)."""
    from deva_spark.functions.vectors import deterministic_planes

    planes = deterministic_planes(dim, n_planes * n_tables)
    rows = ",\n".join(
        f"({t}, {p}, [{', '.join(repr(v) for v in planes[t * n_planes + p])}])"
        for t in range(n_tables)
        for p in range(n_planes)
    )
    return f"""WITH planes(t, p, w) AS (VALUES
{rows}
        ), vec AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings
        ), signs AS (
          SELECT v.vec_id, pl.t, pl.p,
                 CASE WHEN list_sum(list_transform(range(1, {dim + 1}),
                          i -> v.e[i] * pl.w[i])) >= 0
                      THEN CAST(power(2, pl.p) AS BIGINT) ELSE 0 END AS bit
          FROM vec v CROSS JOIN planes pl
        ), buckets AS (
          SELECT vec_id, t, SUM(bit) AS b FROM signs GROUP BY vec_id, t
        ), cand AS (
          SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
          FROM buckets a JOIN buckets b2 USING (t, b)
          WHERE a.vec_id < b2.vec_id
        ), scored AS (
          SELECT c.id_a, c.id_b,
                 ROUND(list_sum(list_transform(range(1, {dim + 1}), i -> va.e[i] * vb.e[i]))
                       / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> va.e[i] * va.e[i])))
                        * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> vb.e[i] * vb.e[i])))), 4) AS cos
          FROM cand c
          JOIN vec va ON va.vec_id = c.id_a
          JOIN vec vb ON vb.vec_id = c.id_b
        )
        SELECT id_a, id_b, cos FROM scored WHERE cos >= {threshold} {restrict}
        ORDER BY id_a, id_b"""


@query("x23_cosine_neardup", None)  # oracle attached below (generated)
def x23(spark, sf):
    # embedding-cosine near-dup tier of the dedup stack, BUCKET-LOCAL
    # formulation (`vectors.cosine_neardup_pairs_grouped`): each LSH
    # (table, bucket) group computes its pairwise cosines with one numpy
    # gram (the semdedup shape) and only qualifying pairs leave the
    # group — each vector shuffles once per table instead of 2 x dim
    # doubles PER CANDIDATE PAIR (the pair-join route's dominant cost:
    # 9.7 s -> 1.4 s at the amplified sf1, bit-identical output,
    # parity-tested in test_text_similarity.py). The emb_base projection
    # (per-vector norms + bucket ids) comes through the shared artifact
    # tier — staged parquet when staged, eagerly-persisted session cache
    # otherwise (VERDICT r8 #4).
    base = _shared_artifact(spark, sf, "emb_base")
    return V.cosine_neardup_pairs_grouped(base, threshold=0.4)


ORACLE_SQL["x23_cosine_neardup"] = _x23_oracle()


@query(
    "x24_asof_join",
    """SELECT l.event_id, l.user_id, l.value AS click_value,
              r.value AS last_purchase
       FROM (SELECT * FROM events WHERE event_type = 'click') l
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
         ON l.user_id = r.user_id AND l.ts >= r.ts
       ORDER BY l.event_id""",
)
def x24(spark, sf):
    # two-table as-of join (combine_latest generalization): each click gets
    # the most recent purchase value per user; union + last-value window —
    # one shuffle, no range-join blowup.
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return joins.asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts", value_cols=["value"]
    ).select(
        "event_id",
        "user_id",
        F.col("value").alias("click_value"),
        F.col("value_asof").alias("last_purchase"),
    )


@query(
    "x25_session_stats",
    """WITH s AS (
         SELECT user_id, event_id, epoch_us(ts) AS us,
                CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) sess
         FROM (SELECT *, CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                   > INTERVAL 30 MINUTE
                              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         THEN 1 ELSE 0 END new_s FROM events) a)
       SELECT user_id, sess, COUNT(*) AS cnt,
              MAX(us) - MIN(us) AS dur_us
       FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
)
def x25(spark, sf):
    # session analytics on top of sessionize: size + exact integer-µs span.
    return (
        _t(spark, sf, "events")
        .transform(windows.sessionize(30))
        .transform(lambda d: d.withColumn("_us", windows.epoch_micros(d, "ts")))
        .groupBy("user_id", "sess")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (F.max("_us") - F.min("_us")).alias("dur_us"),
        )
    )


@query(
    "x26_histogram",
    """WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
       SELECT CASE WHEN lo = hi THEN 0
                   ELSE least(9, CAST(floor((value - lo) / (hi - lo) * 10) AS BIGINT))
              END AS bucket, COUNT(*) AS cnt
       FROM events CROSS JOIN b GROUP BY 1 ORDER BY 1""",
)
def x26(spark, sf):
    # fixed-width histogram; bounds ride the plan as a broadcast 1-row agg
    # and the bucket formula is written identically in both engines.
    return _t(spark, sf, "events").transform(
        agg.histogram_fixed_width("value", n_buckets=10)
    )


@query(
    "x27_pivot_counts",
    """SELECT CAST(ts AS DATE) AS day,
              COUNT(*) FILTER (event_type = 'click') AS click,
              COUNT(*) FILTER (event_type = 'error') AS error,
              COUNT(*) FILTER (event_type = 'purchase') AS purchase,
              COUNT(*) FILTER (event_type = 'signup') AS signup,
              COUNT(*) FILTER (event_type = 'view') AS view
       FROM events GROUP BY 1 ORDER BY 1""",
)
def x27(spark, sf):
    # wide per-day event-type counts (declared pivot values — no discovery
    # pass, schema fixed up front).
    return _t(spark, sf, "events").transform(
        agg.pivot_counts(
            F.to_date("ts"), "day", "event_type",
            ["click", "error", "purchase", "signup", "view"],
        )
    )


@query(
    "x28_bpe_tokens",
    r"""SELECT doc_id,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS n_pieces
        FROM documents ORDER BY doc_id""",
)
def x28(spark, sf):
    # BPE-ish pre-tokenizer piece count (letters merge, digits don't).
    return _t(spark, sf, "documents").select(
        "doc_id", T.bpe_ish_token_count(F.col("text")).alias("n_pieces")
    )


@query(
    "x29_rolling_hash",
    """SELECT doc_id,
              CAST(list_reduce(
                     list_prepend(CAST(0 AS HUGEINT),
                       list_transform(regexp_extract_all(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), '.'),
                                      c -> CAST(ascii(c) AS HUGEINT))),
                     (h, c) -> (h * 257 + c) % 2305843009213693951) AS BIGINT) AS rhash
       FROM documents ORDER BY doc_id""",
)
def x29(spark, sf):
    # polynomial rolling-hash fingerprint (Rabin-Karp mod 2^61-1).
    return _t(spark, sf, "documents").select(
        "doc_id", T.rolling_hash(F.col("text")).alias("rhash")
    )


@query(
    "x30_take_while",
    # NOT COALESCE(cond, FALSE): a NULL predicate is a stop row in BOTH
    # engines (reference truthiness — any non-true value ends the prefix);
    # a bare NOT(cond) would silently skip NULL rows in the failure set
    """WITH o AS (SELECT event_id, value,
                         ROW_NUMBER() OVER (ORDER BY ts, event_id) rn FROM events)
       SELECT event_id FROM o
       WHERE rn < COALESCE((SELECT MIN(rn) FROM o
                            WHERE NOT COALESCE(value < 450, FALSE)),
                           9223372036854775807)
       ORDER BY event_id""",
)
def x30(spark, sf):
    # pipe take_while: the event prefix (total order) while value < 450;
    # two-phase numbering + parallel MIN cut — no single-reducer window.
    from deva_spark.operators import sampling

    return (
        _t(spark, sf, "events")
        .transform(sampling.take_while(F.col("value") < 450, windows.EVENT_ORDER))
        .select("event_id")
    )


@query(
    "x31_ordered_pairs",
    """SELECT a.r_name AS a, b.r_name AS b
       FROM region a CROSS JOIN region b
       WHERE a.r_name <> b.r_name ORDER BY 1, 2""",
)
def x31(spark, sf):
    # permutations(2) analog: ordered pairs of distinct keys.
    from deva_spark.operators import reshape

    return reshape.ordered_pairs(_t(spark, sf, "region"), "r_name")


def _x32_oracle(
    n_cells: int = 16, n_probe: int = 4, k: int = 5, train_where: str = ""
) -> str:
    """DuckDB mirror of the FULL IVF pipeline (VERDICT r2 #8): seed pick →
    initial assignment → one Lloyd step → re-normalize → probe → exact
    rescore → (cos DESC, vec_id) rank. Every stage is deterministic on
    both engines (stable tie-breaks, members averaged in vec_id order);
    the only cross-engine noise is summation-order float error (~1e-15),
    absorbed by the 4 dp rounding exactly as in x09/x23.

    ``train_where``: optional SQL predicate restricting the CENTER
    TRAINING corpus (seeds + Lloyd step) — the x79 incremental-append
    mirror, where centers come from the pre-append corpus but the whole
    grown corpus is assigned and searched."""
    return f"""WITH vec AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
                 sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
          FROM embeddings
        ), seeds AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell,
                 list_transform(e, x -> x / n) AS s
          FROM vec {train_where} ORDER BY vec_id LIMIT {n_cells}
        ), sim0 AS (
          SELECT v.vec_id, sd.cell,
                 list_sum(list_transform(range(1, 65),
                      i -> (v.e[i] / v.n) * sd.s[i])) AS sim
          FROM (SELECT * FROM vec {train_where}) v CROSS JOIN seeds sd
        ), a0 AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, cell) AS r
            FROM sim0) WHERE r = 1
        ), lmean AS (
          SELECT a0.cell, i, AVG(v.e[i]) AS m
          FROM a0 JOIN vec v USING (vec_id), range(1, 65) t(i)
          GROUP BY a0.cell, i
        ), lcent AS (
          SELECT cell, list(m ORDER BY i) AS c FROM lmean GROUP BY cell
        ), cent AS (
          SELECT sd.cell, COALESCE(lc.c, sd.s) AS c0
          FROM seeds sd LEFT JOIN lcent lc USING (cell)
        ), cnorm AS (
          SELECT cell, list_transform(c0, x -> x /
                 sqrt(list_sum(list_transform(c0, y -> y * y)))) AS c
          FROM cent
        ), simc AS (
          SELECT v.vec_id, cn.cell,
                 list_sum(list_transform(range(1, 65),
                      i -> (v.e[i] / v.n) * cn.c[i])) AS sim
          FROM vec v CROSS JOIN cnorm cn
        ), ranked AS (
          SELECT vec_id, cell,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cell) AS r
          FROM simc
        ), members AS (SELECT vec_id, cell FROM ranked WHERE r = 1),
        probes AS (SELECT vec_id AS qid, cell FROM ranked
                   WHERE r <= {n_probe} AND vec_id < 10),
        cand AS (
          SELECT DISTINCT p.qid, m.vec_id
          FROM probes p JOIN members m USING (cell)
          WHERE m.vec_id <> p.qid
        ), scored AS (
          SELECT c.qid, c.vec_id,
                 ROUND(list_sum(list_transform(range(1, 65),
                       i -> q.e[i] * v.e[i])) / (q.n * v.n), 4) AS cos
          FROM cand c
          JOIN vec q ON q.vec_id = c.qid
          JOIN vec v ON v.vec_id = c.vec_id
        ), r AS (
          SELECT qid, vec_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cos DESC, vec_id) AS rnk
          FROM scored)
        SELECT qid, vec_id, cos, rnk FROM r WHERE rnk <= {k} ORDER BY qid, rnk"""


@query("x32_ivf_topk", None)  # oracle attached below (generated)
def x32(spark, sf):
    # IVF ANN scale path, hash-checked against a generated DuckDB mirror
    # of the whole pipeline since round 3. When the cell-partitioned
    # "ivf16" artifact is staged (bench stages it; the 100 TB "train
    # once, search many" layout), search is a partition-pruned scan of
    # the probe cells (ivf_search_staged) — identical results for
    # identical centers/params, so the same oracle covers both routes.
    # Unstaged (ad-hoc/correctness runs): self-contained in-query build.
    emb = _t(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    staged = staged_artifact_path(sf, "ivf16")
    if staged:
        return V.ivf_search_staged(spark, staged, q, k=5, n_probe=4)
    return V.ivf_topk(emb, q, k=5)


ORACLE_SQL["x32_ivf_topk"] = _x32_oracle()


def _staged_required(sf_dir: str, name: str) -> str:
    """staged_artifact_path that FAILS LOUDLY: the x101-x103 stagers
    write parquet + a sidecar marker, and a crash between the two left
    path=None flowing into ivfpq_search as an obscure path-type error
    far from the cause (r11 review)."""
    path = staged_artifact_path(sf_dir, name)
    if path is None:
        raise RuntimeError(
            f"artifact {name!r} did not stage completely under {sf_dir} "
            "(marker missing) — re-run stage_artifacts or inspect the "
            "stager's write"
        )
    return path


def _cached_win8_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached full-corpus 8-token window-hash index — the
    UNSTAGED fallback x77/x78 share (r11 review: each invocation used
    to persist a FRESH corpus-sized copy with no unpersist, so repeated
    runs in one session accumulated duplicate cache entries until
    eviction pressure hit every other cached artifact)."""
    from deva_spark.functions.substring import window_hashes

    cache = _session_cache(spark)
    key = (sf_dir, "win8_index_inline")
    if key not in cache:
        cache[key] = window_hashes(
            _t(spark, sf_dir, "documents"), window=8
        )
    df = cache[key]
    if df.storageLevel.useMemory is False and df.storageLevel.useDisk is False:
        df.persist()
        df.count()
    return df


def _staged_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table once per (session, sf) as ts-ordered chunks —
    the replayable input the streaming queries drain. Session-scoped via
    the same weak-keyed cache as the doc index."""
    # mtime in the key: a regenerated source table within one session
    # must restage, not replay stale chunks (the x95 bitmap / artifact-
    # tier convention; r11 review)
    try:
        _mt = int(_os.path.getmtime(_os.path.join(sf_dir, "events.parquet")))
    except OSError:
        _mt = 0
    cache = _session_cache(spark)
    key = (sf_dir, "staged_events", _mt)
    if key not in cache:
        from deva_spark.streaming.twin import stage_event_chunks

        cache[key] = stage_event_chunks(spark, sf_dir, chunks=4)
    return cache[key]


def _staged_docs(
    spark: SparkSession, sf_dir: str, where: str = "doc_id % 10 = 0"
) -> str:
    """Stage the new-batch document slice (scale-invariant modular
    arrival split by default) once per (session, sf) as doc_id-ordered
    chunks for the streaming incremental-dedup drain."""
    # mtime in the key: a regenerated source table within one session
    # must restage, not replay stale chunks (the x95 bitmap / artifact-
    # tier convention; r11 review)
    try:
        _mt = int(_os.path.getmtime(_os.path.join(sf_dir, "documents.parquet")))
    except OSError:
        _mt = 0
    cache = _session_cache(spark)
    key = (sf_dir, "staged_docs", where, _mt)
    if key not in cache:
        from deva_spark.streaming.twin import stage_doc_chunks

        cache[key] = stage_doc_chunks(spark, sf_dir, chunks=3, where=where)
    return cache[key]


