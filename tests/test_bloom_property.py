"""Property test: bloom pruning must NEVER change merge results.

Blooms drop files from the rewrite set; a false positive only costs a
rewrite, but a false NEGATIVE (skipping a file that holds a batch key)
would resurrect stale rows. The property: for random initial states and
batches, a bloom-indexed upsert produces exactly the rows a pure-Python
reference merge produces — same harness as the key-range property test,
with the bloom pass stacked on top of the interval pass.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_hudi_spark.storage.native import NativeTable

# tiny pool → identical keys and range-straddling batches; string-encoded
# keys compare lexicographically ("10" < "9") so interval stats mislead in
# exactly the way blooms must stay correct under
KEYS = st.integers(min_value=0, max_value=40)


@st.composite
def scenario(draw):
    initial = draw(st.lists(st.tuples(KEYS, st.integers(0, 100)),
                            min_size=1, max_size=50))
    batch = draw(st.lists(st.tuples(KEYS, st.integers(0, 100)),
                          min_size=1, max_size=20))
    width = draw(st.sampled_from([1, 3, 6]))
    return initial, batch, width


def _resolve(rows, state=None):
    state = dict(state or {})
    for k, v in rows:
        cur = state.get(k)
        state[k] = v if cur is None or v > cur else cur
    return state


@given(data=scenario())
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_bloom_merge_equals_reference(spark, data):
    initial, batch, width = data
    work = tempfile.mkdtemp(prefix="ghs_bloomprop_")
    try:
        t = NativeTable(spark, f"{work}/tbl", record_keys=["k"],
                        precombine="v", files_per_partition=width,
                        bloom_index=True)
        init_state = _resolve(initial)
        t.bulk_insert(spark.createDataFrame(
            [(k, v) for k, v in init_state.items()], "k int, v int"))
        c = t.upsert(spark.createDataFrame(batch, "k int, v int"))

        expected = dict(init_state)
        expected.update(_resolve(batch))
        got = {r["k"]: r["v"] for r in t.read_snapshot().collect()}
        assert got == expected
        assert c.stats["files_rewritten"] + c.stats["files_carried"] >= 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# _IntervalStab: the per-key range-candidacy index behind the scale-safe
# bloom probe — must agree with a naive linear scan on any interval set.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

from glue_hudi_spark.storage.native import _IntervalStab

_keys = st.text(alphabet="abcdef0123456789", min_size=0, max_size=6)


@given(
    ivs=st.lists(st.tuples(_keys, _keys), min_size=0, max_size=40),
    probes=st.lists(_keys, min_size=1, max_size=20),
)
@settings(max_examples=300, deadline=None)
def test_interval_stab_matches_naive(ivs, probes):
    intervals = [
        (min(a, b), max(a, b), f"f{i}") for i, (a, b) in enumerate(ivs)
    ]
    stab = _IntervalStab(intervals)
    for k in probes:
        expect = sorted(t for lo, hi, t in intervals if lo <= k <= hi)
        assert sorted(stab.stab(k)) == expect, (k, intervals)
