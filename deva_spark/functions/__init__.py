"""Scalar/text/similarity function library.

Everything here stays JVM-side (built-in ``pyspark.sql.functions`` /
higher-order array functions) except the simhash fingerprint, which is a
vectorized Arrow pandas UDF (functions/simhash.py) — the reference's text
stack (`/root/reference/deva/utils/simhash.py`, `search.py`) is pure-Python
per-row; ours is columnar.
"""

from deva_spark.functions import (  # noqa: F401
    http,
    llm,
    minhash,
    multimodal,
    search,
    simhash,
    text,
    vectors,
)
