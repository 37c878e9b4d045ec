"""Property-based DSL compiler test: for random expression trees, the
compiled Spark SQL predicate selects exactly the rows a direct Python
evaluation of the tree selects (no-null data; SQL and Python three-valued
logic only diverge on nulls, covered by the unit ring)."""

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from gordo_components_spark.functions.filter_dsl import compile_filter

COLS = ["A", "B", "C"]

# expression tree nodes: ('col', name) | ('num', v) | (op, left, right) | ('not', x)
_nums = st.one_of(
    st.integers(min_value=0, max_value=20),
    st.floats(min_value=0.25, max_value=20, allow_nan=False, width=32),
)


def _leaf():
    return st.one_of(
        st.sampled_from(COLS).map(lambda c: ("col", c)),
        _nums.map(lambda v: ("num", v)),
    )


def _arith(children):
    return st.tuples(st.sampled_from(["+", "-", "*"]), children, children)


_arith_expr = st.recursive(_leaf(), _arith, max_leaves=4)

_cmp = st.tuples(
    st.sampled_from(["==", "!=", ">", ">=", "<", "<="]), _arith_expr, _arith_expr
)


def _bool(children):
    return st.one_of(
        st.tuples(st.just("&"), children, children),
        st.tuples(st.just("|"), children, children),
        st.tuples(st.just("not"), children),
    )


_bool_expr = st.recursive(_cmp, _bool, max_leaves=6)


def render(node) -> str:
    kind = node[0]
    if kind == "col":
        return f"`{node[1]}`"
    if kind == "num":
        return repr(node[1])
    if kind == "not":
        return f"~({render(node[1])})"
    if kind in ("&", "|"):
        return f"({render(node[1])}) {kind} ({render(node[2])})"
    return f"({render(node[1])}) {kind} ({render(node[2])})"


def pyeval(node, row) -> float | bool:
    kind = node[0]
    if kind == "col":
        return row[node[1]]
    if kind == "num":
        return node[1]
    if kind == "not":
        return not pyeval(node[1], row)
    a = pyeval(node[1], row)
    if kind in ("&", "|"):
        b = pyeval(node[2], row)
        return (a and b) if kind == "&" else (a or b)
    b = pyeval(node[2], row)
    return {
        "+": lambda: a + b,
        "-": lambda: a - b,
        "*": lambda: a * b,
        "==": lambda: a == b,
        "!=": lambda: a != b,
        ">": lambda: a > b,
        ">=": lambda: a >= b,
        "<": lambda: a < b,
        "<=": lambda: a <= b,
    }[kind]()


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        {"id": i, "A": float(a), "B": float(b), "C": float(c)}
        for i, (a, b, c) in enumerate(
            (a, b, c) for a in (0, 1, 3.5, 10) for b in (0, 2, 7) for c in (1, 4.25)
        )
    ]
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("dsl_prop_table")
    return pdf


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=_bool_expr)
def test_compiled_sql_matches_python_eval(spark, table, tree):
    sql = compile_filter(render(tree), columns=COLS)
    got = {
        r["id"]
        for r in spark.sql(f"SELECT id FROM dsl_prop_table WHERE {sql}").collect()
    }
    want = {int(row["id"]) for _, row in table.iterrows() if bool(pyeval(tree, row))}
    assert got == want, f"expr={render(tree)} sql={sql}"
