"""Cron / interval / date job scheduling for pipelines.

Reference surface: the apscheduler-backed ``scheduler`` stream and timer
flows (`/root/reference/deva/core/when.py:73-194` — interval/cron/date
triggers whose results are emitted into a stream; §3.3's timer → fetch →
strategy loop).

Spark mapping: a scheduled job runs a batch pipeline or drains a stream
with ``Trigger.AvailableNow`` (`streaming/twin.py:74`) — each tick is a
bounded, checkpointed run, which is exactly what a cron-fired flow wants
(no always-on cluster, incremental progress between ticks). Trigger
computation is pure and injectable-clock, so next-fire logic is
deterministic and testable without sleeping; ``Scheduler.run_pending``
can be driven by any loop (a CLI daemon, Airflow, a systemd timer).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from dataclasses import dataclass, field


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    """One cron field → the set of matching values. Supports ``*``,
    ``*/n``, ``a``, ``a-b``, ``a-b/n`` and comma lists."""
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron step must be positive: {spec!r}")
        if part == "*":
            lo_p, hi_p = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo_p, hi_p = int(a), int(b)
        else:
            lo_p = hi_p = int(part)
        vals = list(range(lo_p, hi_p + 1, step))
        if not vals:
            # a reversed range ('30-20') would otherwise parse as an
            # empty set and surface hours later as a misleading "never
            # fires" after the full search scan (r11 review)
            raise ValueError(f"cron field part {part!r} matches nothing")
        for v in vals:
            if not lo <= v <= hi:
                raise ValueError(f"cron value {v} out of range [{lo},{hi}]")
            out.add(v)
    return out


@dataclass(frozen=True)
class CronTrigger:
    """5-field cron (minute hour day-of-month month day-of-week; dow 0=Sun,
    7 also accepted as Sun). Standard semantics: when BOTH dom and dow are
    restricted, a time matches if EITHER does."""

    expr: str

    def _fields(self):
        parts = self.expr.split()
        if len(parts) != 5:
            raise ValueError(f"cron needs 5 fields, got {self.expr!r}")
        minute = _parse_field(parts[0], 0, 59)
        hour = _parse_field(parts[1], 0, 23)
        dom = _parse_field(parts[2], 1, 31)
        month = _parse_field(parts[3], 1, 12)
        # parse 0-7 directly, then fold 7 -> 0 (Sunday); a textual
        # replace("7","0") would corrupt ranges/steps like "1-7" or "*/7"
        dow = {v % 7 for v in _parse_field(parts[4], 0, 7)}
        return minute, hour, dom, month, dow, parts

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        minute, hour, dom, month, dow, parts = self._fields()
        # Vixie rule: a day field is "restricted" iff it does NOT start
        # with '*' — so '*/2' is unrestricted and combines with dow by
        # AND, not the either-matches rule (r11 review; a bare equality
        # test misclassified step fields and over-fired)
        dom_star = parts[2].startswith("*")
        dow_star = parts[4].startswith("*")
        t = (after + dt.timedelta(minutes=1)).replace(second=0, microsecond=0)
        # Day-granular scan (not minute-granular): bound 9 years of days
        # (~3.3k iterations) crosses the longest Feb-29 gap — 2096 to
        # 2104 over the non-leap century 2100 — which a 4-year minute
        # scan spuriously rejected (r11 review), at 1/1440th the cost.
        day = t.date()
        for _ in range(366 * 9):
            if day.month in month:
                dom_ok = day.day in dom
                dow_ok = day.isoweekday() % 7 in dow
                day_ok = (
                    (dom_ok or dow_ok)
                    if not dom_star and not dow_star
                    else (dom_ok and dow_ok)
                )
                if day_ok:
                    for h in sorted(hour):
                        for m in sorted(minute):
                            cand = dt.datetime.combine(
                                day, dt.time(h, m), tzinfo=t.tzinfo
                            )
                            if cand >= t:
                                return cand
            day += dt.timedelta(days=1)
        raise ValueError(f"cron {self.expr!r} never fires")


@dataclass(frozen=True)
class IntervalTrigger:
    """Fixed-period trigger (the reference's default ``interval``)."""

    seconds: float

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        return after + dt.timedelta(seconds=self.seconds)


@dataclass(frozen=True)
class DateTrigger:
    """One-shot at a fixed time (apscheduler ``date``)."""

    when: dt.datetime

    def next_fire(self, after: dt.datetime) -> dt.datetime | None:
        return self.when if self.when > after else None


@dataclass
class Job:
    name: str
    trigger: object
    fn: Callable[[], object]
    next_run: dt.datetime | None = None
    last_result: object = None
    runs: int = 0


@dataclass
class Scheduler:
    """Pure-python job scheduler with an injectable clock.

    ``run_pending(now)`` fires every due job once and reschedules —
    deterministic under test (pass explicit ``now``), and a thin daemon
    loop (`sleep + run_pending`) in production. Job results land in
    ``Job.last_result`` and the optional ``on_result`` callback — the
    analog of the reference emitting results into the stream graph.
    """

    jobs: dict[str, Job] = field(default_factory=dict)
    on_result: Callable[[str, object], None] | None = None

    def add_job(
        self,
        fn: Callable[[], object],
        name: str,
        trigger: object | None = None,
        *,
        cron: str | None = None,
        seconds: float | None = None,
        at: dt.datetime | None = None,
        now: dt.datetime | None = None,
    ) -> Job:
        if trigger is None:
            if cron is not None:
                trigger = CronTrigger(cron)
            elif seconds is not None:
                trigger = IntervalTrigger(seconds)
            elif at is not None:
                trigger = DateTrigger(at)
            else:
                raise ValueError("need trigger=, cron=, seconds=, or at=")
        now = now or dt.datetime.now()
        next_run = trigger.next_fire(now)
        if next_run is None and isinstance(trigger, DateTrigger):
            # missed one-shot (at= already past): catch up at the next
            # run_pending instead of storing a permanently dead job that
            # never fires and never leaves the table (r11 review)
            next_run = now
        job = Job(name=name, trigger=trigger, fn=fn, next_run=next_run)
        self.jobs[name] = job
        return job

    def remove_job(self, name: str) -> bool:
        return self.jobs.pop(name, None) is not None

    def get_jobs(self) -> list[Job]:
        return list(self.jobs.values())

    def run_pending(self, now: dt.datetime | None = None) -> list[str]:
        """Fire every job whose ``next_run`` <= now; returns fired names.
        max_instances=1 semantics: a job fires at most once per call even
        if multiple periods elapsed (coalesce)."""
        now = now or dt.datetime.now()
        fired = []
        for job in list(self.jobs.values()):
            if job.next_run is not None and job.next_run <= now:
                job.last_result = job.fn()
                job.runs += 1
                fired.append(job.name)
                job.next_run = job.trigger.next_fire(now)
                if job.next_run is None:  # one-shot date trigger: done
                    del self.jobs[job.name]
                if self.on_result is not None:
                    self.on_result(job.name, job.last_result)
        return fired


def scheduled_pipeline_job(stream_df_factory, name: str, output_mode: str = "append"):
    """Wrap a pipeline as a cron-able job: each tick drains the stream with
    ``Trigger.AvailableNow`` (bounded incremental run) and returns the
    result table — the §3.3 timer → fetch → strategy flow on Spark."""
    from deva_spark.streaming.twin import run_available_now

    def _run():
        return run_available_now(stream_df_factory(), name, output_mode=output_mode)

    return _run
