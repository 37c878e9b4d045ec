"""Row-filter DSL compiler tests (FIXTURES B2; reference
``tests/gordo_components/dataset/test_filter_rows.py`` semantics)."""

import pytest

from gordo_components_spark.functions.filter_dsl import (
    FilterDSLError,
    compile_filter,
    parse_filter_vars,
)


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("`TAG-1` > 0", "(`TAG-1` > 0)"),
        ("(`TAG-1` > 0) & (`TAG-2` < 0.5)", "((`TAG-1` > 0) AND (`TAG-2` < 0.5))"),
        ("`TAG-1` > 0 | ~(`TAG-2` == 0)", "((`TAG-1` > 0) OR (NOT (`TAG-2` = 0)))"),
        ("`TAG-1` + `TAG-2` > 0.1", "((`TAG-1` + `TAG-2`) > 0.1)"),
        ("~(`TAG-1` != 5)", "(NOT (`TAG-1` <> 5))"),
        ("`TAG-1` * 2 - 1 <= `TAG-2` / 4", "(((`TAG-1` * 2) - 1) <= (`TAG-2` / 4))"),
    ],
)
def test_grammar_compiles(expr, expected):
    assert compile_filter(expr) == expected


@pytest.mark.parametrize(
    "expr",
    [
        "__import__('os').system('x')",  # call
        "f(`TAG-1`)",  # call
        "`TAG-1`.attr > 0",  # attribute
        "`TAG-1`[0] > 0",  # subscript
        "lambda: 1",  # lambda
        "`TAG-1` > 0;`TAG-2` > 0",  # statements
        "`TAG-1` if 1 else 2",  # conditional
    ],
)
def test_disallowed_syntax_rejected(expr):
    with pytest.raises(FilterDSLError):
        compile_filter(expr)


def test_unknown_column_rejected():
    with pytest.raises(FilterDSLError, match="unknown column"):
        compile_filter("`NOPE` > 0", columns=["TAG-1"])


def test_parse_filter_vars_order_and_dedup():
    assert parse_filter_vars("(`B` > 0) & (`A` < `B`)") == ["B", "A"]


def test_semantics_on_spark(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (-1.0, 5.0), (2.0, 0.0)], ["TAG-1", "TAG-2"]
    )
    out = df.filter(compile_filter("(`TAG-1` > 0) & ~(`TAG-2` == 0)")).collect()
    assert [(r["TAG-1"], r["TAG-2"]) for r in out] == [(1.0, 5.0)]


def test_null_rows_dropped_like_pandas(spark):
    # comparisons with NULL are not TRUE -> row dropped (matches the
    # reference's eval-mask behavior where NaN comparisons are False)
    df = spark.createDataFrame([(None,), (1.0,)], "`TAG-1` double")
    out = df.filter(compile_filter("`TAG-1` > 0")).collect()
    assert len(out) == 1


def test_string_backslash_is_literal(spark):
    # Spark SQL interprets C-style escapes in string literals; the DSL
    # must escape them so a literal backslash matches literally (r6
    # review: 'a\nb' used to match the NEWLINE row)
    df = spark.createDataFrame([("a\\nb",), ("a\nb",)], "tag string")
    out = df.filter(compile_filter("`tag` == 'a\\nb'", ["tag"])).collect()
    assert [r["tag"] for r in out] == ["a\\nb"]
