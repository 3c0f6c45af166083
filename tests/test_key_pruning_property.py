"""Property test for record-level key-range pruning (round-2 verdict #10).

The per-file [min,max] key index decides which files a merge rewrites —
correct-by-construction today (no stats → file stays affected), but
load-bearing for merge cost, so it gets adversarial coverage: all-identical
keys, single-file tables, keys straddling file boundaries, batches of only
new keys. The property: a pruned upsert produces EXACTLY the rows a
reference merge (pure Python) produces, and the stats stay sane.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from glue_hudi_spark.storage.native import NativeTable

# small key pool → plenty of identical keys and boundary-straddling ranges;
# record keys are string-encoded, so files' footer stats compare
# lexicographically — "10" < "9" — which is exactly the adversarial case
KEYS = st.integers(min_value=0, max_value=40)


@st.composite
def scenario(draw):
    initial = draw(st.lists(st.tuples(KEYS, st.integers(0, 100)),
                            min_size=1, max_size=60))
    batch = draw(st.lists(st.tuples(KEYS, st.integers(0, 100)),
                          min_size=1, max_size=25))
    width = draw(st.sampled_from([1, 2, 5]))  # 1 ⇒ single-file table
    return initial, batch, width


def _resolve(rows, state=None):
    """Max-precombine-wins per key (ties keep the max value — with a
    single numeric column that IS the precombine order)."""
    state = dict(state or {})
    for k, v in rows:
        cur = state.get(k)
        state[k] = v if cur is None or v > cur else cur
    return state


@given(data=scenario())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_pruned_merge_equals_reference(spark, data):
    initial, batch, width = data
    work = tempfile.mkdtemp(prefix="ghs_prop_")
    try:
        t = NativeTable(spark, f"{work}/tbl", record_keys=["k"],
                        precombine="v", files_per_partition=width)
        # feed bulk_insert already-resolved state (it doesn't dedup) so the
        # upsert is the operation under test
        init_state = _resolve(initial)
        t.bulk_insert(spark.createDataFrame(
            [(k, v) for k, v in init_state.items()], "k int, v int"))
        c = t.upsert(spark.createDataFrame(batch, "k int, v int"))

        # upsert semantics: batch resolves internally by max precombine,
        # then replaces existing rows by key unconditionally
        expected = dict(init_state)
        expected.update(_resolve(batch))
        got = {r["k"]: r["v"] for r in t.read_snapshot().collect()}
        assert got == expected
        # files_rewritten == 0 is legal: a batch of only-new keys outside
        # every file's range prunes everything and lands as a pure insert
        assert c.stats["files_rewritten"] >= 0
        assert c.stats["files_carried"] >= 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
