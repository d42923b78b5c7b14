"""catalog.table's events.ts normalization must pin the file's wall
time to the same UTC instant regardless of the caller's session
timezone — the property that makes every epoch-µs-based operator
(as-of join, range join, trailing windows, gap-fill) give identical
answers under any driver session. A bare cast('timestamp') would
shift by the session offset; to_utc_timestamp(ts,'UTC') must not."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs537_spring2021_p3a_mapreduce_spark.catalog import table

SF_SMOKE = "/root/testdata/sf0.001"


def test_events_instant_stable_across_session_timezones(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")

    def min_max_us():
        # bypass the relation cache: session tz is not in its key
        from cs537_spring2021_p3a_mapreduce_spark import catalog

        catalog._RELATION_CACHE.clear()
        r = (
            table(spark, SF_SMOKE, "events")
            .agg(
                F.min(F.unix_micros("ts")).alias("lo"),
                F.max(F.unix_micros("ts")).alias("hi"),
            )
            .collect()[0]
        )
        return r.lo, r.hi

    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = min_max_us()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = min_max_us()
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo = min_max_us()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        from cs537_spring2021_p3a_mapreduce_spark import catalog

        catalog._RELATION_CACHE.clear()

    assert utc == ny == tokyo
