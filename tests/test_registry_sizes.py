"""Pin the query-registry sizes so SURVEY.md's counts can't drift.

VERDICT r4 found SURVEY claiming 156/150 while the actual dict literals
held 157/151; this test asserts the real sizes (update BOTH this test and
SURVEY.md's "Registered driver queries now" line when adding a query).
"""

import sys

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod  # noqa: E402

EXPECTED_QUERIES = 157
EXPECTED_ORACLES = 151
# iterative / non-SQL-expressible carve-outs: driver rows-only check +
# from-scratch pytest oracles
EXPECTED_ROWS_ONLY = {
    "fs_em_weights", "correlation_clusters", "mention_features",
    "bpe_train", "bpe_apply", "pca_components",
}


def test_registry_sizes():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) == EXPECTED_QUERIES, len(q)
    assert len(o) == EXPECTED_ORACLES, len(o)
    assert set(o) <= set(q)
    assert set(q) - set(o) == EXPECTED_ROWS_ONLY


def test_driver_window_is_valid():
    q = entrymod.queries()
    window = list(q)[:50]
    assert len(set(window)) == 50
    assert window == entrymod._DRIVER_WINDOW
