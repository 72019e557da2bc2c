"""Text analysis: tokenization, language-ID, quality scoring, fingerprinting.

Reference surface: jieba keyword extraction (`/root/reference/deva/search.py:179-207`),
``extract(...)`` regex family (`pipe.py:1428-1485`), string pipes
(`pipe.py:783-849`). Extended with the training-data-pipeline operators the
reference lacks: language identification, document quality scoring, token
counting, and content fingerprinting — all pure built-in column
expressions (whole-stage codegen, no Python in the hot path).

Design for oracle parity: ratio thresholds compare with integer
cross-multiplication (``cnt * 100 >= total * pct``) so no float boundary
can disagree between engines.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

#: Tiny high-frequency English stopword list used by the n-gram/stopword
#: language heuristic and the quality score. Kept deliberately small and
#: hard-coded so the DuckDB oracle can embed the identical list.
EN_STOPWORDS: tuple[str, ...] = (
    "the",
    "a",
    "of",
    "and",
    "to",
    "in",
    "is",
    "that",
    "it",
    "on",
)


def words(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (regex split, JVM-side)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Token count: number of whitespace-separated tokens."""
    return F.size(words(text))


def stopword_count(text: Column) -> Column:
    """Number of tokens that are (lowercased) English stopwords."""
    return F.size(F.filter(words(F.lower(text)), lambda w: w.isin(*EN_STOPWORDS)))


def digit_char_count(text: Column) -> Column:
    """Number of digit characters (regexp_extract_all keeps this JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[0-9]"), F.lit(0)))


def lang_id(text: Column, pct_threshold: int = 15) -> Column:
    """Stopword-ratio language heuristic: 'en' when >= pct_threshold % of
    tokens are common English stopwords, else 'other'.

    The real n-gram language models are external libraries; this in-engine
    heuristic is the Spark-side plumbing (exact, deterministic, and cheap —
    one pass over the token array per row).
    """
    total = token_count(text)
    hits = stopword_count(text)
    return F.when(hits * 100 >= total * pct_threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def quality_score(text: Column) -> Column:
    """Document quality score in [0, 100]: rewards a sane length band,
    stopword presence, and penalizes digit-heavy content.

    Components (integer-exact, then one float division at the end):
      length_ok   : 30 if 50 <= n_chars <= 5000
      stop_ok     : 40 if stopword tokens >= 10% of tokens
      digit_pen   : 30 * (1 - digit_chars/n_chars) — mostly-digit docs score low
    """
    n_chars = F.length(text)
    total = token_count(text)
    stops = stopword_count(text)
    digits = digit_char_count(text)
    length_ok = F.when((n_chars >= 50) & (n_chars <= 5000), F.lit(30)).otherwise(F.lit(0))
    stop_ok = F.when(stops * 10 >= total, F.lit(40)).otherwise(F.lit(0))
    digit_pen = F.when(
        n_chars > 0, F.lit(30.0) * (F.lit(1.0) - digits.cast("double") / n_chars.cast("double"))
    ).otherwise(F.lit(0.0))
    return F.round(length_ok + stop_ok + digit_pen, 2)


def normalize_text(text: Column) -> Column:
    """Canonical form for content hashing: lowercase, collapse whitespace,
    trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Content fingerprint: MD5 of the normalized text. At 100 TB this is
    the dedup shuffle key — 32 bytes instead of the document body."""
    return F.md5(normalize_text(text))


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an already-computed ``array<string>``
    words column (1-based element_at so the DuckDB oracle's 1-based list
    indexing matches exactly).

    Callers in the hot path should PROJECT the words array into a column
    first (``.withColumn("_ws", words(text))``) and pass ``F.col("_ws")``
    here: passing the raw ``words(text)`` expression inlines the regexp
    split ``n+2`` times inside a higher-order lambda, which blows up the
    generated code (measured 13s -> 1.4s on x45 at sf0.1 from this alone).

    Guarded for short texts: Spark's ``sequence(1, 0)`` counts *down*
    (would yield bogus indices), so docs with fewer than ``n`` tokens get
    an empty shingle array explicitly.
    """
    idx = F.sequence(F.lit(1), F.size(w) - (n - 1))
    shingles = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(w) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string>; see
    :func:`shingles_from_words` for the hot-path form over a projected
    words column."""
    return shingles_from_words(words(text), n)


def _distinct_shingles_py(text: str, n: int = 3) -> list[str]:
    """Python twin of ``array_distinct(word_shingles(text))`` (str.split()
    == trim + whitespace-run split, matching the ``\\s+`` regex)."""
    if text is None:
        return []
    ws = text.split()
    if len(ws) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(ws) - n + 1):
        seen[" ".join(ws[i : i + n])] = None
    return list(seen)


# Arrow-batched shingle generation. The column-expression version re-inlines
# the `split(trim(text))` subexpression into every element_at (projection
# collapse), turning one split per doc into ~3×|shingles| regex splits —
# observed 9.7 s vs <1 s for 5k docs. Use this in hot paths.
@pandas_udf(ArrayType(StringType()))
def distinct_word_shingles_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_distinct_shingles_py)


# ---------------------------------------------------------------------------
# extract(...) family (`/root/reference/deva/pipe.py:1428-1485`): named regex
# extraction as pure column expressions (regexp_extract_all stays JVM-side).
# The reference's 'tags' mode (jieba TF-IDF keywords) lives in
# functions/search.py as tf-idf terms; 'table' (pd.read_html) is out of
# engine scope.
# ---------------------------------------------------------------------------

EXTRACT_PATTERNS: dict[str, str] = {
    "numbers": r"[0-9]+(?:\.[0-9]+)?",
    "url": r"https?://[^\s<>\"]+",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"1[3-9][0-9]{9}",  # CN mobile, as the reference targets
    "chinese": r"[一-鿿]+",
    "hashtag": r"#\w+",
}


def extract_all(text: Column, kind: str) -> Column:
    """``extract('numbers'|'url'|'email'|'phone'|'chinese')`` analog:
    array of every match."""
    if kind not in EXTRACT_PATTERNS:
        raise KeyError(f"unknown extract kind {kind!r}; have {sorted(EXTRACT_PATTERNS)}")
    return F.regexp_extract_all(text, F.lit(EXTRACT_PATTERNS[kind]), F.lit(0))


def truncate(text: Column, n: int, suffix: str = "...") -> Column:
    """pipe ``truncate`` analog (`pipe.py:1519-1522`)."""
    return F.when(
        F.length(text) <= n, text
    ).otherwise(F.concat(F.substring(text, 1, n), F.lit(suffix)))


# ---------------------------------------------------------------------------
# Training-pipeline token accounting (BASELINE.json north star): a BPE-ish
# regex piece counter and a polynomial rolling-hash fingerprint — both pure
# column expressions with exact DuckDB twins.
# ---------------------------------------------------------------------------

#: BPE-ish pre-tokenization: letter runs, single digits, single non-space
#: symbols — the shape GPT-2-family pre-tokenizers use (letters merge,
#: digits don't), portable across regex engines (no lookarounds).
BPE_ISH_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]"


def bpe_ish_tokens(text: Column) -> Column:
    """Array of BPE-ish pieces of the lowercased text."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), F.lit(0))


def bpe_ish_token_count(text: Column) -> Column:
    """Piece count under the BPE-ish pre-tokenizer — the second token
    accounting the brief asks for beside whitespace ``token_count``."""
    return F.size(bpe_ish_tokens(text))


#: modulus of the rolling hash (Mersenne prime, same as MinHash M61)
ROLLING_HASH_MOD = (1 << 61) - 1


def rolling_hash(text: Column, base: int = 257) -> Column:
    """Polynomial rolling-hash document fingerprint (Rabin–Karp):
    ``h = fold(h * base + code(char)) mod 2^61-1`` over the alphanumeric
    characters of the lowercased text.

    Restricted to ``[a-z0-9]``, so every kept character is one ASCII
    byte and the fold is engine-portable (DuckDB mirrors it with
    ``list_reduce`` in HUGEINT).

    Implementation (r14 optimization pass, guide §4.2): an
    Arrow-batched pandas UDF folding Python ints — exact arithmetic,
    bit-identical to the previous Catalyst ``aggregate`` over
    DECIMAL(38,0) (oracle-verified), but ~3x cheaper per byte: the
    interpreted higher-order-function lambda allocated a per-character
    decimal and re-entered the expression interpreter per step, while
    the Python fold is one bytecode loop over the normalized bytes.
    NULL text stays NULL (the Catalyst chain's semantics)."""
    import re as _re

    mod = ROLLING_HASH_MOD
    strip = _re.compile(r"[^a-z0-9]")

    @pandas_udf("long")
    def _fold(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            h = 0
            for c in strip.sub("", t.lower()).encode():
                h = (h * base + c) % mod
            out.append(h)
        return pd.Series(out, dtype="object")

    return _fold(text)


#: output schema of the repetition counters (all BIGINT — integer outputs
#: are exactly hash-stable across engines; a rounded double ratio can land
#: on a half-ulp boundary and round differently).
_REPETITION_FIELDS = (
    "n_words",
    "n_distinct_words",
    "n_bigrams",
    "top_bigram_count",
    "n_trigrams",
    "n_distinct_trigrams",
)


@pandas_udf(
    StructType(
        [StructField(f, LongType()) for f in _REPETITION_FIELDS]
    )
)
def repetition_signals(texts: pd.Series) -> pd.DataFrame:
    """Gopher-style repetition/diversity counters as a struct of BIGINTs
    (Rae et al. 2021 §A1.1 quality filters: repeated-n-gram fractions).

    Fields: ``n_words``, ``n_distinct_words`` (diversity),
    ``n_bigrams``/``top_bigram_count`` (top-2-gram repetition),
    ``n_trigrams``/``n_distinct_trigrams`` (duplicate-3-gram mass).
    Ratio thresholds are integer cross-multiplied by the caller.

    Arrow-batched pandas UDF, one linear Counter pass per doc — a pure
    map with no shuffle. The same semantics as pure column expressions
    (:func:`repetition_signals_expr`) measured 100x slower because array
    lambdas (``transform``/``aggregate``) evaluate interpreted outside
    whole-stage codegen; this is the documented exception where Python
    beats built-ins. ``re.split(r"\\s+", text.strip())`` is the exact
    twin of both engines' regex split (empty text -> ``[""]``)."""
    import re
    from collections import Counter

    rows = []
    for t in texts:
        ws = re.split(r"\s+", (t or "").strip())
        n = len(ws)
        bg = [ws[i] + " " + ws[i + 1] for i in range(n - 1)]
        tg = [ws[i] + " " + ws[i + 1] + " " + ws[i + 2] for i in range(n - 2)]
        rows.append(
            (
                n,
                len(set(ws)),
                len(bg),
                max(Counter(bg).values()) if bg else 0,
                len(tg),
                len(set(tg)),
            )
        )
    return pd.DataFrame(rows, columns=list(_REPETITION_FIELDS))


def repetition_signals_expr(text: Column) -> Column:
    """Pure-column-expression variant of :func:`repetition_signals` for
    Python-less deployments. Semantically identical; slower, because
    higher-order array functions evaluate interpreted (no codegen) —
    prefer the pandas UDF in the hot path."""
    w = words(text)
    bg = word_shingles(text, n=2)
    tg = word_shingles(text, n=3)
    # max-frequency element = longest equal-run of the sorted array: an
    # O(n log n) sort + O(n) fold. (The obvious
    # transform(distinct, x -> count_eq(x)) is O(distinct * n) and array
    # lambdas evaluate interpreted, not codegen — measured 670x slower.)
    top_bigram = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("bigint")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.struct(
        F.size(w).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct_words"),
        F.size(bg).cast("bigint").alias("n_bigrams"),
        top_bigram.cast("bigint").alias("top_bigram_count"),
        F.size(tg).cast("bigint").alias("n_trigrams"),
        F.size(F.array_distinct(tg)).cast("bigint").alias("n_distinct_trigrams"),
    )


#: PII patterns, applied in order (email first: its local part could
#: otherwise be half-eaten by the phone pattern). RE2-compatible (no
#: backrefs/lookarounds) so Spark (Java regex) and DuckDB (RE2) agree.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    (r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}(-[0-9]{3,4})?", "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Chained global regex redaction of emails, IPv4s, and dashed phone
    numbers (the pre-training scrub pass). Stays JVM-side
    (`regexp_replace` replaces all matches); pattern order is part of the
    contract — see :data:`PII_PATTERNS`."""
    out = text
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def canonical_url(
    url: Column,
    drop_params: Sequence[str] = (
        "fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref",
    ),
    drop_www: bool = False,
) -> Column:
    """Canonical form of an http(s) URL for crawl dedup — the key under
    which two fetches of the same page collapse: lowercase scheme/host,
    fragment stripped, default ports dropped (``:80``/``:443``), query
    parameters SORTED with tracking params removed (``utm_*`` plus
    ``drop_params``), trailing path slash trimmed (root path collapses
    to empty, so ``http://a.com/`` == ``http://a.com``). Pure column
    algebra over ``try_parse_url`` + array ops — whole-stage codegen, so
    canonicalizing 10^11 crawl records pipelines inside the scan.
    Non-URL input (no ``scheme://``) returns NULL — filter upstream or
    coalesce to the raw string, caller's choice."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host0 = F.lower(F.try_parse_url(u, F.lit("HOST")))
    host = (
        F.regexp_replace(host0, r"^www\.", "") if drop_www else host0
    )
    auth = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path0 = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.when(path0 == "/", "").otherwise(
        F.regexp_replace(path0, r"/+$", "")
    )
    q0 = F.try_parse_url(u, F.lit("QUERY"))
    params = F.filter(
        F.split(F.coalesce(q0, F.lit("")), "&"),
        lambda p: (p != "")
        & ~F.lower(F.substring_index(p, "=", 1)).startswith("utm_")
        & ~F.lower(F.substring_index(p, "=", 1)).isin(*drop_params),
    )
    query = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & host.isNotNull() & (host != ""), rebuilt)


def nfkc_fold(text: Column) -> Column:
    """Unicode-robust dedup normalization: NFKC-normalize (fullwidth →
    ASCII, ligatures split, compatibility forms folded), casefold, and
    strip combining marks (NFD-decompose, drop Mn category) — so
    "Ｃａｆé", "CAFÉ" and "café" all produce one dedup key. The
    one text stage that genuinely needs Python (`unicodedata` is the
    reference implementation of the tables; no JVM expression carries
    them), so it is an Arrow pandas UDF — batch-columnar, the sanctioned
    slow path, and only ever applied to the KEY side of a dedup (32-byte
    digests downstream), never as a corpus rewrite."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("string")
    def _fold(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize("NFKC", t).casefold()
            return "".join(
                ch
                for ch in unicodedata.normalize("NFD", t)
                if unicodedata.category(ch) != "Mn"
            )

        return s.map(one)

    return _fold(text)
