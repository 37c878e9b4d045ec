"""Row-filter DSL → Spark SQL compiler.

Reference: ``gordo_components/dataset/filter_rows.py::pandas_filter_rows``
/ ``::parse_pandas_filter_vars`` (SURVEY §2 O10).  The reference parses a
pandas-``eval``-style boolean expression over tag columns with a strict
AST whitelist — comparisons, ``& | ~``, parens, arithmetic — and drops
rows failing it.  We keep the exact same surface grammar but compile to a
Spark SQL predicate string, so the filter executes JVM-side inside
whole-stage codegen (and pushes down through joins/aggregates) instead of
in a Python loop.

Grammar accepted (same as pandas.eval subset the reference whitelists):

    expr     := boolean combination via ``&`` ``|`` ``~`` and parentheses
    atom     := comparison | arithmetic over columns/literals
    compare  := a (== != > >= < <=) b   (chained comparisons allowed)
    arith    := + - * / % and unary -
    column   := `backtick quoted` or bare identifier
    literal  := int/float/string/True/False

Anything else — function calls, attribute access, subscripts, names not
in the supplied column set — raises ``FilterDSLError`` (the reference
raises on unexpected AST nodes likewise).
"""

from __future__ import annotations

import ast
import re


class FilterDSLError(ValueError):
    """Invalid or disallowed filter expression."""


_BACKTICK = re.compile(r"`([^`]+)`")

_CMP_OPS = {
    ast.Eq: "=",
    ast.NotEq: "<>",
    ast.Gt: ">",
    ast.GtE: ">=",
    ast.Lt: "<",
    ast.LtE: "<=",
}
_BIN_OPS = {
    ast.Add: "+",
    ast.Sub: "-",
    ast.Mult: "*",
    ast.Div: "/",
    ast.Mod: "%",
    ast.BitAnd: "AND",
    ast.BitOr: "OR",
}


def parse_filter_vars(expr: str) -> list[str]:
    """Column names referenced by the expression (reference:
    ``parse_pandas_filter_vars``) — backticked or bare identifiers."""
    cols, placeholders = _extract_backticks(expr)
    tree = _parse(placeholders)
    names: list[str] = []

    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.append(cols.get(node.id, node.id))
    seen: set[str] = set()
    return [n for n in names if not (n in seen or seen.add(n))]


def compile_filter(expr: str, columns: list[str] | None = None) -> str:
    """Compile the DSL string to a Spark SQL boolean expression.

    ``columns``, when given, whitelists referencable column names — any
    other name is rejected (matches the reference's behavior of only
    exposing the frame's tag columns to ``eval``).
    """
    cols, placeholder_expr = _extract_backticks(expr)
    tree = _parse(placeholder_expr)
    sql = _render(tree.body, cols, set(columns) if columns is not None else None)
    return sql


def _extract_backticks(expr: str) -> tuple[dict[str, str], str]:
    """Replace `TAG-1`-style quoted names with safe placeholders so the
    Python parser accepts them; return placeholder→original mapping."""
    mapping: dict[str, str] = {}

    def repl(m: re.Match) -> str:
        key = f"__col{len(mapping)}__"
        mapping[key] = m.group(1)
        return key

    return mapping, _BACKTICK.sub(repl, expr)


def _parse(expr: str) -> ast.Expression:
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError as e:
        raise FilterDSLError(f"invalid filter expression: {e}") from e
    return tree


def _quote(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _render(node: ast.AST, cols: dict[str, str], allowed: set[str] | None) -> str:
    if isinstance(node, ast.Compare):
        left = _render(node.left, cols, allowed)
        parts = []
        for op, comp in zip(node.ops, node.comparators):
            if type(op) not in _CMP_OPS:
                raise FilterDSLError(f"disallowed comparison {type(op).__name__}")
            right = _render(comp, cols, allowed)
            parts.append(f"({left} {_CMP_OPS[type(op)]} {right})")
            left = right
        return parts[0] if len(parts) == 1 else "(" + " AND ".join(parts) + ")"
    if isinstance(node, ast.BinOp):
        if type(node.op) not in _BIN_OPS:
            raise FilterDSLError(f"disallowed operator {type(node.op).__name__}")
        op = _BIN_OPS[type(node.op)]
        return f"({_render(node.left, cols, allowed)} {op} {_render(node.right, cols, allowed)})"
    if isinstance(node, ast.UnaryOp):
        if isinstance(node.op, ast.Invert):
            return f"(NOT {_render(node.operand, cols, allowed)})"
        if isinstance(node.op, ast.USub):
            return f"(- {_render(node.operand, cols, allowed)})"
        raise FilterDSLError(f"disallowed unary {type(node.op).__name__}")
    if isinstance(node, ast.Name):
        name = cols.get(node.id, node.id)
        if allowed is not None and name not in allowed:
            raise FilterDSLError(f"unknown column {name!r}")
        return _quote(name)
    if isinstance(node, ast.Constant):
        if isinstance(node.value, bool):
            return "TRUE" if node.value else "FALSE"
        if isinstance(node.value, (int, float)):
            return repr(node.value)
        if isinstance(node.value, str):
            return "'" + node.value.replace("'", "''") + "'"
        raise FilterDSLError(f"disallowed literal {node.value!r}")
    raise FilterDSLError(f"disallowed syntax {type(node).__name__}")
