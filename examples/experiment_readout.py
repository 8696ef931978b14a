#!/usr/bin/env python
"""Experimentation-readout example: the A/B analysis surface end to end,
in the order a real readout runs — validity guardrail (sample-ratio
mismatch), variance reduction (CUPED), causal estimate (diff-in-diffs),
uncertainty for a ratio metric (delta method), and next-experiment
planning (power analysis) — printed as a compact report.

    python examples/experiment_readout.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from mapreduce_machine_learning_spark.registry import all_queries  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = example_session("experiment-readout")
    qs = all_queries()

    srm = qs["q_events_srm"](spark, sf_dir).collect()[0]
    print(
        f"srm guardrail: treat={srm['n_treat']} ctrl={srm['n_ctrl']} "
        f"chi2={srm['chi2']} -> {srm['verdict']}"
    )

    cuped = qs["q_events_cuped"](spark, sf_dir).collect()[0]
    print(
        f"cuped: theta={cuped['theta']} var_reduction="
        f"{cuped['var_reduction']} adjusted_diff={cuped['adjusted_diff']}"
    )

    did = qs["q_events_did"](spark, sf_dir).collect()[0]
    print(
        f"diff-in-diffs: treat={did['diff_treat']} ctrl={did['diff_ctrl']} "
        f"did={did['did']}"
    )

    ratio = qs["q_ml_ratio_ci"](spark, sf_dir).collect()[0]
    print(
        f"ratio metric (rev/order, customer-clustered): "
        f"{ratio['ratio']} +- [{ratio['ci_lo']}, {ratio['ci_hi']}]"
    )

    tt = qs["q_ml_welch_ttest"](spark, sf_dir).collect()[0]
    print(
        f"welch t (purchase vs click value): t={tt['t_stat']} "
        f"df={tt['df_welch']}"
    )

    power = qs["q_ml_power"](spark, sf_dir).collect()[0]
    print(
        f"power plan: sigma2={power['sigma2']} -> n/arm for $5 MDE: "
        f"{power['n_per_arm']}"
    )

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
