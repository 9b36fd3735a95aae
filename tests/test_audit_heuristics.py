"""Unit pins for scripts/audit_plans.py's text heuristics (both r11
advice fixes): the ambiguous 2-bracket-group Window resolution must
follow the order-spec GRAMMAR, and the top-level splitter must keep
function arguments together."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from scripts.audit_plans import _top_level_entries, _window_is_unpartitioned


def test_one_group_is_unpartitioned():
    assert _window_is_unpartitioned("[count(1) AS n#5L]")


def test_three_groups_is_partitioned():
    assert not _window_is_unpartitioned(
        "[row_number() AS rn#1], [user_id#2L], [ts#3L ASC NULLS FIRST]")


def test_two_groups_order_spec_is_unpartitioned():
    assert _window_is_unpartitioned(
        "[row_number() AS rn#1], [n#2L DESC NULLS LAST, k#3 ASC NULLS FIRST]")
    assert _window_is_unpartitioned(
        "[rank() AS r#1], [score#2 DESC]")


def test_two_groups_partition_spec_is_partitioned():
    assert not _window_is_unpartitioned(
        "[sum(v#1) AS s#2], [user_id#3L]")
    # the r11 advice case: a PARTITION expression whose printed text
    # embeds a sort-order string inside parens — substring matching
    # called this unpartitioned; the grammar must not
    assert not _window_is_unpartitioned(
        "[sum(v#1) AS s#2], "
        "[windowspecdefinition(k#3, ts#4 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$()))]")
    assert not _window_is_unpartitioned(
        "[sum(v#1) AS s#2], [sort_array(arr#3, true), k#4]")


def test_two_groups_mixed_entries_not_order_spec():
    # ALL entries must end with a direction for the group to be an
    # order spec; one bare expression makes it a partition spec
    assert not _window_is_unpartitioned(
        "[f() AS x#1], [a#2 ASC NULLS FIRST, b#3]")


def test_top_level_entries_keeps_function_args_together():
    assert _top_level_entries("[f(a, b), c, g(h(x, y))]") == [
        "f(a, b)", "c", "g(h(x, y))"]
    assert _top_level_entries("[one]") == ["one"]
    assert _top_level_entries("[]") == []
