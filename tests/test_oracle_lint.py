"""Unit tests for the oracle determinism linter — the linter guards the
driver contract, so its rules get pinned too."""

from __future__ import annotations

from tools.oracle_lint import lint_sql


def test_flags_nondeterminism():
    assert lint_sql("q", "SELECT rand() AS x FROM t")
    assert lint_sql("q", "SELECT now() FROM t")
    assert lint_sql("q", "SELECT current_timestamp FROM t")


def test_flags_spark_only_hash():
    assert lint_sql("q", "SELECT xxhash64(c) FROM t")
    assert not lint_sql("q", "SELECT md5(c) FROM t")


def test_flags_unprotected_double_sum_but_not_decimal_transit():
    assert lint_sql("q", "SELECT SUM(x * 1.5) FROM t")
    assert not lint_sql(
        "q", "SELECT CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) FROM t"
    )


def test_flags_decimal_product():
    assert lint_sql("q", "SELECT CAST(a AS DECIMAL(38,6)) * CAST(b AS DECIMAL(38,6)) FROM t")


def test_flags_single_key_topk_but_not_tiebroken():
    assert lint_sql("q", "SELECT * FROM t ORDER BY score LIMIT 5")
    assert not lint_sql("q", "SELECT * FROM t ORDER BY score DESC, id LIMIT 5")


def test_allow_marker_suppresses_same_and_previous_line():
    assert not lint_sql("q", "SELECT SUM(x * 1.5) FROM t -- lint: allow R3")
    assert not lint_sql(
        "q", "-- lint: allow R3 (reason)\nSUM(CASE WHEN a THEN 1.0 ELSE 0.0 END) AS s"
    )


def test_two_markers_on_one_line_suppress_both_rules():
    sql = "SELECT SUM(xxhash64(c) * 1.5) FROM t -- lint: allow R2 -- lint: allow R3"
    assert not lint_sql("q", sql)


def test_topk_with_parenthesized_sort_key():
    # pre-fix the [^)]+? regex silently skipped any paren-bearing key
    assert lint_sql("q", "SELECT * FROM t ORDER BY round(x, 6) LIMIT 5")
    assert not lint_sql("q", "SELECT * FROM t ORDER BY round(x, 6), id LIMIT 5")
    assert not lint_sql(
        "q", "SELECT * FROM t ORDER BY round(x, 6) LIMIT 5 -- lint: allow R5"
    )


def test_subquery_order_by_without_limit_not_flagged():
    sql = "SELECT * FROM (SELECT a FROM t ORDER BY a) q JOIN u ON q.a = u.a LIMIT 3"
    # the inner ORDER BY closes before any LIMIT; the outer LIMIT has no
    # ORDER BY at all — neither is a top-k
    assert not lint_sql("q", sql)
