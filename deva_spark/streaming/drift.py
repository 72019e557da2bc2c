"""Concept-drift detection stream — ADWIN (Bifet & Gavaldà 2007).

Reference surface: per-key ADWIN drift detectors from the river library
(`/root/reference/deva/naja/radar/engine.py:241-263`) — in-process dicts of
detector objects.

Spark mapping: ``applyInPandasWithState`` carrying each key's detector in
the checkpointed state store. The detector is the paper's ADWIN2: an
exponential histogram of buckets — each a ``(count, sum, sum-of-squared-
deviations)`` triple, counts all powers of two, at most ``M`` buckets per
capacity; overflow merges the two OLDEST buckets of a capacity into one
of double capacity (parallel-axis variance combine), so memory is
``O(M log(n/M))`` for a window of n elements — and the adaptive cut test

    |mu_0 - mu_1| >= sqrt((2/m) * sigma2_W * ln(2/delta')) +
                     (2/(3m)) * ln(2/delta')

with ``m`` the harmonic mean of the sub-window sizes, ``sigma2_W`` the
variance of the WHOLE window and ``delta' = delta / n`` — evaluated at
every bucket boundary; on a cut the oldest bucket is dropped and the
test repeats until no boundary fires (the paper's variance-aware bound:
a stable low-variance stream gets a tight bound, a noisy one a loose
bound, instead of the variance-blind Hoeffding epsilon the r1-r7 analog
used).
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: bucket triples as three parallel arrays (the state store holds flat
#: arrays; a struct-of-arrays round-trips cheaply through Arrow)
DRIFT_STATE_SCHEMA = "ns array<long>, sums array<double>, vars array<double>"
DRIFT_OUT_SCHEMA = "user_id long, event_id long, old_mean double, new_mean double"

M = 5  # max buckets per capacity (the paper's M)
DELTA = 0.002  # confidence parameter (ADWIN's delta)
MIN_WINDOW = 10  # don't test cuts until the window has this many elements


class Adwin:
    """ADWIN2 exponential histogram over (n, sum, var) buckets, ordered
    OLDEST first. ``var`` is the sum of squared deviations from the
    bucket mean (n * variance), the parallel-axis-combinable form."""

    __slots__ = ("ns", "sums", "vars")

    def __init__(self, ns=(), sums=(), vars=()):  # noqa: A002
        self.ns = list(ns)
        self.sums = list(sums)
        self.vars = list(vars)

    @property
    def n(self) -> int:
        return sum(self.ns)

    @property
    def total(self) -> float:
        return sum(self.sums)

    def variance(self) -> float:
        """Variance of the whole window via parallel-axis accumulation."""
        n, s, v = 0, 0.0, 0.0
        for bn, bs, bv in zip(self.ns, self.sums, self.vars):
            if n == 0:
                n, s, v = bn, bs, bv
                continue
            d = s / n - bs / bn
            v = v + bv + (n * bn / (n + bn)) * d * d
            n += bn
            s += bs
        return v / n if n else 0.0

    def insert(self, value: float) -> None:
        self.ns.append(1)
        self.sums.append(value)
        self.vars.append(0.0)
        self._compress()

    def _compress(self) -> None:
        # cascade: >M buckets of one capacity -> merge the two OLDEST of
        # that capacity into one of double capacity; the merge can
        # overflow the next row, hence the loop over capacities
        cap = 1
        while True:
            idxs = [i for i, bn in enumerate(self.ns) if bn == cap]
            if len(idxs) <= M:
                if cap > max(self.ns, default=1):
                    return
                cap *= 2
                continue
            i, j = idxs[0], idxs[1]  # oldest two (list is oldest-first)
            na, nb = self.ns[i], self.ns[j]
            sa, sb = self.sums[i], self.sums[j]
            d = sa / na - sb / nb
            self.vars[i] = (
                self.vars[i] + self.vars[j] + (na * nb / (na + nb)) * d * d
            )
            self.ns[i] = na + nb
            self.sums[i] = sa + sb
            del self.ns[j], self.sums[j], self.vars[j]
            # re-check the same capacity (a restored state could be >M+1
            # over); the merged bucket lands in the next row, which the
            # loop reaches when this row fits

    def detect_and_shrink(self) -> tuple[float, float] | None:
        """Run the cut test at every bucket boundary; on a cut drop the
        oldest bucket and repeat. Returns (dropped_mean, kept_mean) when
        anything was dropped, else None."""
        dropped_n, dropped_sum = 0, 0.0
        while len(self.ns) > 1 and self.n >= MIN_WINDOW:
            n = self.n
            sigma2 = self.variance()
            ln_term = math.log(2.0 * n / DELTA)  # ln(2/delta'), delta'=delta/n
            total = self.total
            n0, s0 = 0, 0.0
            cut = False
            for i in range(len(self.ns) - 1):
                n0 += self.ns[i]
                s0 += self.sums[i]
                n1 = n - n0
                s1 = total - s0
                if n0 < 1 or n1 < 1:
                    continue
                m = 1.0 / (1.0 / n0 + 1.0 / n1)
                eps = math.sqrt((2.0 / m) * sigma2 * ln_term) + (
                    2.0 / (3.0 * m)
                ) * ln_term
                if abs(s0 / n0 - s1 / n1) >= eps:
                    cut = True
                    break
            if not cut:
                break
            dropped_n += self.ns[0]
            dropped_sum += self.sums[0]
            del self.ns[0], self.sums[0], self.vars[0]
        if dropped_n:
            kept_n = self.n
            return (
                dropped_sum / dropped_n,
                self.total / kept_n if kept_n else float("nan"),
            )
        return None


def _adwin_fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    if state.exists:
        ns, sums, vars_ = state.get
        det = Adwin(ns or (), sums or (), vars_ or ())
    else:
        det = Adwin()
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, v in zip(pdf["event_id"], pdf["value"]):
            det.insert(float(v))
            shrink = det.detect_and_shrink()
            if shrink is not None:
                out.append((int(key[0]), int(eid), shrink[0], shrink[1]))
    state.update((det.ns, det.sums, det.vars))
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
