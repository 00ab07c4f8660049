"""State-contract fence for EVERY streaming catalog entry
(VERDICT r12 #2).

The r11 unbounded stream-stream join (fixed in ccf1cee for the two
minhash twins) shipped a full round of green gates because bounded
gate runs never notice unbounded state. This sweep replays each
streaming entry and asserts the set of STATEFUL operators reported by
the executed StreamingQuery's final progress equals the entry's
DECLARED contract below — most entries declare zero state
(stream-static broadcasts only); aggregation entries declare exactly
their one aggregation; the sessionize / dedup / flatMapGroupsWithState
/ watermark-bounded-join entries declare their named operator.

Writing this fence immediately caught the THIRD member of the bug
class: streaming_incremental_perceptual joined its candidate rows
back to the stream-side signature frame — a symmetricHashJoin
buffering 94k state rows on the sf0.001 corpus alone, directly
contradicting its "zero state" docstring. Fixed in the same commit
via signature_bands(keep_signature=True) (the minhash-twin device);
reverting that fix makes test_state_contract[streaming_incremental_
perceptual] fail with `symmetricHashJoin not declared`.

A NEW streaming entry must add a row to STATE_CONTRACTS — the
coverage test fails otherwise — which forces the author to state what
state the plan is supposed to hold at the moment they write it.
"""

import pytest

from analyst_spark.plans import streaming_plans as st
from analyst_spark.plans.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# entry -> set of allowed stateful operatorName values. Empty set =
# the plan must hold NO state (every join stream-static, no
# aggregation, no dropDuplicates).
STATE_CONTRACTS = {
    # zero-state probes: per-row signatures + stream-static broadcast
    # joins against a maintained index / frozen stats
    "streaming_classifier_gate": set(),
    "streaming_contamination_delta": set(),
    "streaming_contamination_embedding": set(),
    "streaming_contamination_minhash": set(),
    "streaming_incremental_embedding": set(),
    "streaming_incremental_neardup": set(),
    "streaming_incremental_perceptual": set(),
    # exactly one streaming aggregation (complete-mode rollup or
    # mergeable sketch); state rows bounded by the group/sketch size
    "streaming_anomaly_gate": {"stateStoreSave"},
    "streaming_anomaly_mad": {"stateStoreSave"},
    "streaming_distinct_users_hll": {"stateStoreSave"},
    "streaming_heavy_hitters_cms": {"stateStoreSave"},
    "streaming_hourly_rollup": {"stateStoreSave"},
    "streaming_quality_filter": {"stateStoreSave"},
    "streaming_value_histogram": {"stateStoreSave"},
    # declared bounded-state machinery
    "streaming_dedup": {"dedupeWithinWatermark"},
    "streaming_running_totals": {"applyInPandasWithState"},
    "streaming_sessionize": {"sessionWindowStateStoreSaveExec"},
    # genuine stream-stream join, state bounded by the 1h watermark
    "streaming_view_click_join": {"symmetricHashJoin"},
}

STREAMING_ENTRIES = sorted(n for n in QUERIES if n.startswith("streaming"))


def test_every_streaming_entry_declares_a_state_contract():
    assert set(STREAMING_ENTRIES) == set(STATE_CONTRACTS), (
        "streaming catalog entries and STATE_CONTRACTS diverged — "
        "declare the expected stateful operators for new entries"
    )


@pytest.mark.parametrize("name", STREAMING_ENTRIES)
def test_state_contract(spark, name):
    st.STATE_AUDIT.clear()
    QUERIES[name](spark, SF_DIR).collect()
    assert st.STATE_AUDIT, (
        f"{name} ran no streaming query through _await_or_raise — "
        "the audit hook was bypassed"
    )
    observed = {
        op.get("operatorName")
        for _, sops in st.STATE_AUDIT
        for op in sops
        # an operator that exists in the plan but held nothing and
        # wrote nothing is not a state commitment (complete-mode
        # re-emission keeps numRowsTotal > 0 for real aggregations)
        if op.get("numRowsTotal", 0) > 0 or op.get("numRowsUpdated", 0) > 0
    }
    allowed = STATE_CONTRACTS[name]
    undeclared = observed - allowed
    assert not undeclared, (
        f"{name} holds streaming state its contract does not declare: "
        f"{sorted(undeclared)} (allowed: {sorted(allowed)}). If this "
        "is intentional, update STATE_CONTRACTS AND the entry "
        "docstring's state story; if not, you probably joined two "
        "stream-derived frames (see signature_bands/band_buckets "
        "keep_signature)."
    )
    missing = allowed - observed
    assert not missing, (
        f"{name} no longer exercises its declared stateful operators "
        f"{sorted(missing)} — update the contract if the plan "
        "legitimately changed"
    )
