"""Concept-drift detection stream (ADWIN analog).

Reference surface: per-key ADWIN drift detectors from the river library
(`/root/reference/deva/naja/radar/engine.py:241-263`) — in-process dicts of
detector objects.

Spark mapping: ``applyInPandasWithState`` carrying the detector's window
per key in the checkpointed state store. The detector here is a compact
adaptive-window test in the ADWIN spirit: keep a bounded recent window,
test every cut point with a Hoeffding-style two-sample bound, and shrink
the window when the two halves' means differ significantly — emitting a
drift row at the change point.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DRIFT_STATE_SCHEMA = "window array<double>"
DRIFT_OUT_SCHEMA = "user_id long, event_id long, old_mean double, new_mean double"

MAX_WINDOW = 256
DELTA = 0.002  # confidence parameter (ADWIN's delta)


def _hoeffding_cut(w0: list[float], w1: list[float]) -> bool:
    """True when the two sub-window means differ beyond the adaptive bound."""
    n0, n1 = len(w0), len(w1)
    if n0 < 5 or n1 < 5:
        return False
    m = 1.0 / (1.0 / n0 + 1.0 / n1)
    eps = math.sqrt((1.0 / (2 * m)) * math.log(4.0 / DELTA))
    return abs(sum(w0) / n0 - sum(w1) / n1) > eps


def _adwin_fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    window: list[float] = list(state.get[0]) if state.exists else []
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            window.append(float(row["value"]))
            if len(window) > MAX_WINDOW:
                window.pop(0)
            # test every cut from the newest towards the oldest
            for cut in range(len(window) - 5, 5, -1):
                w0, w1 = window[:cut], window[cut:]
                if _hoeffding_cut(w0, w1):
                    out.append(
                        (
                            int(key[0]),
                            int(row["event_id"]),
                            sum(w0) / len(w0),
                            sum(w1) / len(w1),
                        )
                    )
                    window = w1  # drop the stale half — the adaptive shrink
                    break
    state.update((window,))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "event_id", "old_mean", "new_mean"]
        )


def streaming_drift(stream_df: DataFrame) -> DataFrame:
    """Per-user drift events: (user_id, event_id at detection, means)."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _adwin_fn,
        outputStructType=DRIFT_OUT_SCHEMA,
        stateStructType=DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
