#!/usr/bin/env python
"""Streaming example: replay the events table as a file-source stream and run
the watermarked hourly aggregation to completion (availableNow), printing the
final window table.

    python examples/streaming_monitor.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from mapreduce_machine_learning_spark.streaming.live import (  # noqa: E402
    events_stream,
    run_to_memory,
    tumbling_agg,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = example_session("streaming-monitor")
    result = run_to_memory(
        spark,
        tumbling_agg(events_stream(spark, sf_dir), watermark="1 hour"),
        "hourly",
        "append",
    )
    print(f"{result.count()} closed windows:")
    result.orderBy("window_start", "event_type").show(15, truncate=False)

    from mapreduce_machine_learning_spark.registry import all_queries

    print("EWMA of daily means (batch closed form of the stateful twin):")
    for r in all_queries()["q_stream_ewma"](spark, sf_dir).orderBy(
        "event_type"
    ).collect():
        print(
            f"  {r['event_type']:9s} ewma={r['ewma']:.2f} "
            f"last={r['last_daily_mean']:.2f} over {r['n_days']} days"
        )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
