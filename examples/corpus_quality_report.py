#!/usr/bin/env python
"""Corpus-quality report example: the training-data curation surface end
to end — dataset card, per-rule quality-gate funnel, source diversity,
length percentiles, held-out LM perplexity, boilerplate prefixes, and the
dedup threshold sweep — printed as the report a data-curation review
would read.

    python examples/corpus_quality_report.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples._session import example_session  # noqa: E402

from mapreduce_machine_learning_spark.registry import all_queries  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = example_session("corpus-quality")
    qs = all_queries()

    card = qs["q_llm_data_card"](spark, sf_dir).collect()[0]
    print(
        f"data card: {card['n_docs']} docs / {card['n_langs']} langs / "
        f"{card['n_sources']} sources; {card['total_tokens']} tokens, "
        f"vocab {card['vocab_size']}, dup rate {card['exact_dup_rate']}"
    )

    print("quality gate (per lang: pass / short / long / repetitive):")
    for r in sorted(
        qs["q_llm_quality_gate"](spark, sf_dir).collect(),
        key=lambda r: r["lang"],
    ):
        print(
            f"  {r['lang']}: {r['n_pass']}/{r['n_docs']} pass "
            f"(short={r['kill_short']} long={r['kill_long']} "
            f"rep={r['kill_repetitive']})"
        )

    print("source diversity (effective sources per lang):")
    for r in sorted(
        qs["q_llm_source_diversity"](spark, sf_dir).collect(),
        key=lambda r: r["lang"],
    ):
        print(
            f"  {r['lang']}: {r['effective_sources']} effective of "
            f"{r['n_sources']}"
        )

    ppl = qs["q_llm_heldout_perplexity"](spark, sf_dir).collect()[0]
    print(
        f"held-out unigram perplexity: {ppl['perplexity']} "
        f"(oov rate {ppl['oov_rate']})"
    )

    tmpl = qs["q_llm_template_docs"](spark, sf_dir).collect()
    if tmpl:
        top = tmpl[0]
        print(
            f"top boilerplate prefix: {top['prefix']!r} in "
            f"{top['n_docs']} docs across {top['n_sources']} sources"
        )

    print("dedup severity histogram (jaccard level -> pairs, docs):")
    for r in sorted(
        qs["q_llm_dedup_sweep"](spark, sf_dir).collect(),
        key=lambda r: -r["jaccard"],
    ):
        print(
            f"  {r['jaccard']}: {r['n_pairs']} pairs, "
            f"-{r['n_docs_removed']} docs"
        )

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
