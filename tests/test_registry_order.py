"""Adaptive registration order (the driver-correctness-window gate): the
driver checks the FIRST N entries of queries(), so ordering decides which
queries accumulate driver-green rows each round."""

from mapreduce_machine_learning_spark import registry


def test_contract_ids_all_registered():
    qs = registry.all_queries()
    missing = [c for c in registry.CONTRACT_QUERIES if c not in qs]
    assert not missing, missing
    assert len(registry.CONTRACT_QUERIES) == 68  # SURVEY §2 inventory


def test_never_green_contract_queries_lead():
    """Every contract query without a past driver-green row must precede
    every extension query and every already-green query."""
    names = list(registry.all_queries())
    done = registry._driver_done_queries()
    contract = set(registry.CONTRACT_QUERIES)
    pending_contract = [n for n in names if n in contract and n not in done]
    if pending_contract:
        last_pending = max(names.index(n) for n in pending_contract)
        assert last_pending == len(pending_contract) - 1, (
            "a non-contract or already-green query interleaves the "
            "pending contract block"
        )


def test_done_queries_sink_behind_pending():
    names = list(registry.all_queries())
    done = registry._driver_done_queries()
    if not done:
        return
    first_done = min(names.index(n) for n in names if n in done)
    pending = [n for n in names if n not in done]
    if pending:
        last_pending = max(names.index(n) for n in pending)
        assert first_done > last_pending


def test_order_is_deterministic():
    assert list(registry.all_queries()) == list(registry.all_queries())


def test_oracles_subset_of_queries():
    qs = registry.all_queries()
    os_ = registry.all_oracles()
    assert set(os_) <= set(qs)
    # exactly the two sanctioned rows-only queries lack oracles
    assert set(qs) - set(os_) == {
        "q_agg_approx",
        "q_agg_approx_percentile",
    }
