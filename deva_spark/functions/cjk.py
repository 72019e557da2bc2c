"""CJK tokenization for the text stack.

Reference surface: the jieba Chinese analyzer wired into the Whoosh index
(`/root/reference/deva/search.py:100-101`) and jieba TF-IDF keywords
(`search.py:179-207`).

Spark mapping (SURVEY §7.3 "hard parts"): a vectorized pandas UDF with a
per-worker lazily-initialized tokenizer — the model loads once per
executor process, not per row. jieba is not installed in this container,
so the UDF degrades to a real (not stubbed) character-bigram tokenizer for
Han runs — the standard CJK fallback — while Latin runs split on
whitespace. The UDF signature, lazy-init pattern, and batch shape are what
a jieba deployment would ship.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_HAN_RUN = re.compile(r"[一-鿿]+")

#: per-worker tokenizer cache (jieba loads a dictionary — init once)
_JIEBA = None
_JIEBA_CHECKED = False


def _get_jieba():
    global _JIEBA, _JIEBA_CHECKED
    if not _JIEBA_CHECKED:
        _JIEBA_CHECKED = True
        try:  # pragma: no cover — jieba not present in this container
            import jieba

            jieba.initialize()
            _JIEBA = jieba
        except ImportError:
            _JIEBA = None
    return _JIEBA


def _tokenize_one(text: str) -> list[str]:
    if text is None:
        return []
    jieba = _get_jieba()
    out: list[str] = []
    pos = 0
    for m in _HAN_RUN.finditer(text):
        # latin/other segment before the Han run: whitespace tokens
        out.extend(text[pos : m.start()].split())
        run = m.group(0)
        if jieba is not None:  # pragma: no cover
            out.extend(t for t in jieba.cut(run) if t.strip())
        elif len(run) == 1:
            out.append(run)
        else:
            # character-bigram fallback — the classic CJK analyzer
            out.extend(run[i : i + 2] for i in range(len(run) - 1))
        pos = m.end()
    out.extend(text[pos:].split())
    return out


@pandas_udf(ArrayType(StringType()))
def tokenize_cjk(texts: pd.Series) -> pd.Series:
    """array<string> tokens: jieba segmentation when available, char
    bigrams for Han runs otherwise; whitespace for everything else."""
    return texts.map(_tokenize_one)


def tokens(text_col: Column) -> Column:
    return tokenize_cjk(text_col)
