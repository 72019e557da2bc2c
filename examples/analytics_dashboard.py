"""Product-analytics dashboard demo: funnel + retention + trending,
served as live web pages by the stdlib PageServer.

Each page re-evaluates its lazy plan per request (a live view); the
store endpoint carries run metadata. The demo fetches its own pages to
prove the round-trip, then exits — point a browser at the printed URL
to keep exploring.

Run: python examples/analytics_dashboard.py [sf_dir]
"""

import sys
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from deva_spark.operators.analytics import funnel_counts, retention_cohorts
from deva_spark.session import get_spark, read_table
from deva_spark.sources.page import PageServer


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-dashboard", cpus=8)
    events = read_table(spark, sf_dir, "events")

    funnel = funnel_counts(events, ["signup", "view", "click", "purchase"])
    retention = retention_cohorts(events, max_offset=7).orderBy(
        "cohort_date", "day_offset"
    )
    trending = (
        events.groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"))
    )

    server = PageServer(port=0)
    {"dataset": sf_dir, "events": events.count()} >> server
    for name, df in [
        ("funnel", funnel),
        ("retention", retention),
        ("trending", trending),
    ]:
        print("serving", server.add_view(name, df, limit=40))

    for page in ("data", "df/funnel", "df/retention", "df/trending"):
        body = urllib.request.urlopen(f"{server.url}/{page}", timeout=30).read()
        print(f"GET /{page}: {len(body)} bytes")
    print("dashboard at", server.url, "(exiting demo)")
    server.stop()
    spark.stop()


if __name__ == "__main__":
    main()
