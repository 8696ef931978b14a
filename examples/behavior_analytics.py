#!/usr/bin/env python
"""Behavioral-analytics example: the event-stream surface end to end —
conversion funnel, cohort retention, co-occurrence lift, Markov
transitions, inter-arrival profile and z-score anomaly screen — printed as
a compact report. The "switching user's" smoke test for product analytics.

    python examples/behavior_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from mapreduce_machine_learning_spark.registry import all_queries  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = example_session("behavior-analytics")
    qs = all_queries()

    funnel = qs["q_events_funnel"](spark, sf_dir).collect()[0]
    print(
        f"funnel: view={funnel['stage_view']} -> click={funnel['stage_click']}"
        f" -> purchase={funnel['stage_purchase']}"
    )

    retention = qs["q_events_retention"](spark, sf_dir)
    print(f"retention cells (cohort-day x offset): {retention.count()}")

    print("co-occurrence lift (top 3 by lift):")
    for r in (
        qs["q_events_cooccur"](spark, sf_dir)
        .orderBy("lift", ascending=False)
        .limit(3)
        .collect()
    ):
        print(
            f"  {r['type_a']} + {r['type_b']}: "
            f"{r['baskets_both']} baskets, lift {r['lift']}"
        )

    print("most likely next event per current event:")
    markov = qs["q_events_markov"](spark, sf_dir).collect()
    best: dict = {}
    for r in markov:
        if r["cur"] not in best or r["prob"] > best[r["cur"]]["prob"]:
            best[r["cur"]] = r
    for cur in sorted(best):
        r = best[cur]
        print(f"  {cur} -> {r['nxt']}  p={r['prob']}")

    print("inter-arrival profile:")
    for r in qs["q_events_interarrival"](spark, sf_dir).collect():
        print(
            f"  {r['event_type']:9s} n={r['n_gaps']:6d} "
            f"avg={r['avg_gap_s']:.0f}s p50={r['p50_gap_s']:.0f}s"
        )

    anomalies = qs["q_events_anomaly"](spark, sf_dir).collect()
    n_out = sum(r["n_outliers"] for r in anomalies)
    print(f"z-score outliers (|z|>2) across types: {n_out}")

    print("top session paths:")
    for r in qs["q_events_sessionpath"](spark, sf_dir).limit(3).collect():
        print(f"  {r['path']}: {r['n_sessions']} sessions")

    rfm = qs["q_events_rfm"](spark, sf_dir)
    print(f"RFM cells occupied: {rfm.count()} of 125")

    wau = (
        qs["q_events_wau"](spark, sf_dir)
        .orderBy("day", ascending=False)
        .limit(1)
        .collect()[0]
    )
    print(
        f"latest day: dau={wau['dau']} wau={wau['wau']} "
        f"stickiness={wau['stickiness']}"
    )

    skew = qs["q_events_skewprofile"](spark, sf_dir).collect()[0]
    print(
        f"user_id skew: {skew['n_keys']} keys, top decile carries "
        f"{skew['top_decile_share']:.1%} of events"
    )

    print("peak 30-min concurrency per event type:")
    for r in qs["q_events_concurrency"](spark, sf_dir).orderBy(
        "event_type"
    ).collect():
        print(f"  {r['event_type']:9s} {r['max_concurrent']}")

    print("top behavioral trigrams (event-type initials):")
    for r in qs["q_events_trigrams"](spark, sf_dir).limit(3).collect():
        print(f"  {r['trigram']}  x{r['n']}")

    streaks = qs["q_events_streaks"](spark, sf_dir).collect()
    longest = max(r["streak_len"] for r in streaks)
    print(f"longest consecutive-day activity streak: {longest} days")

    print("worst cumulative-value drawdown per type:")
    for r in qs["q_events_drawdown"](spark, sf_dir).orderBy(
        "event_type"
    ).limit(3).collect():
        print(
            f"  {r['event_type']:9s} {r['max_drawdown']:.1f} "
            f"on {r['worst_day']}"
        )

    print("most probable path from signup (SSSP, -ln p weights):")
    for r in qs["q_graph_sssp"](spark, sf_dir).orderBy(
        "dist_iter2"
    ).collect():
        print(f"  {r['event_type']:9s} dist={r['dist_iter2']}")

    merge = qs["q_events_merge_upsert"](spark, sf_dir).collect()
    parts = ", ".join(
        f"{r['action']}={r['n_users']}" for r in sorted(
            merge, key=lambda r: r["action"])
    )
    print(f"mid-month MERGE classification: {parts}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
