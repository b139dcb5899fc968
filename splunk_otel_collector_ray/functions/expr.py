"""Safe vectorized predicate expressions — the OTTL/expr hook surface.

The reference wires user predicates as expression strings in config: routing
connector conditions (gateway_config.yaml:163-170), stanza router exprs
(``body matches "^\\d+"``, logs_config_linux.yaml:342-346), discovery
``expr`` matches (discoveryreceiver/evaluator.go:79-96). This module gives
our config surface the same power with a SAFE evaluator: the expression is
parsed with ``ast`` and compiled to a vectorized mask builder over batch
columns — no eval(), only a whitelisted node set.

Grammar (python syntax):
    col == "lit"      col != "lit"      col >= 17      col < 3
    matches(col, "^regex$")             col in ("a", "b")
    cond and cond     cond or cond      not cond

Example (the FIXTURES §4 routing table, as config):
    routes = [("sink_tools", "role == 'tool' and tool != ''"),
              ("sink_errors", "severity_number >= 17"),
              ("sink_assistant", "role == 'assistant'")]
"""

from __future__ import annotations

import ast
import re
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

MaskFn = Callable[[pa.Table], np.ndarray]

_CMP = {
    ast.Eq: lambda c, v: c == v,
    ast.NotEq: lambda c, v: c != v,
    ast.Gt: lambda c, v: c > v,
    ast.GtE: lambda c, v: c >= v,
    ast.Lt: lambda c, v: c < v,
    ast.LtE: lambda c, v: c <= v,
}


def _col(batch: pa.Table, name: str):
    if name not in batch.column_names:
        raise KeyError(f"unknown column {name!r} in expression")
    return batch[name].to_pandas()


def compile_predicate(expr: str) -> MaskFn:
    """Compile an expression string to a vectorized batch→bool-mask fn."""
    tree = ast.parse(expr, mode="eval").body

    def build(node) -> MaskFn:
        if isinstance(node, ast.BoolOp):
            parts = [build(v) for v in node.values]
            op = np.logical_and if isinstance(node.op, ast.And) else np.logical_or
            def f(b, parts=parts, op=op):
                m = parts[0](b)
                for p in parts[1:]:
                    m = op(m, p(b))
                return m
            return f
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            inner = build(node.operand)
            return lambda b, inner=inner: ~inner(b)
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1:
                raise ValueError("chained comparisons not supported")
            if not isinstance(node.left, ast.Name):
                raise ValueError("left side must be a column name")
            colname = node.left.id
            op = node.ops[0]
            if isinstance(op, ast.In):
                if not isinstance(node.comparators[0], (ast.Tuple, ast.List)):
                    raise ValueError("'in' needs a literal tuple/list")
                vals = [ast.literal_eval(e) for e in node.comparators[0].elts]
                return lambda b, c=colname, v=vals: _col(b, c).isin(v).to_numpy()
            lit = ast.literal_eval(node.comparators[0])
            fn = _CMP.get(type(op))
            if fn is None:
                raise ValueError(f"unsupported operator {type(op).__name__}")
            return lambda b, c=colname, v=lit, fn=fn: np.asarray(
                fn(_col(b, c), v))
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id == "matches"):
            if (len(node.args) != 2 or not isinstance(node.args[0], ast.Name)):
                raise ValueError("matches(col, 'regex') expected")
            colname = node.args[0].id
            rx = re.compile(ast.literal_eval(node.args[1]))
            return lambda b, c=colname, rx=rx: _col(b, c).str.contains(
                rx, regex=True, na=False).to_numpy()
        raise ValueError(
            f"unsupported expression node {type(node).__name__} "
            "(allowed: comparisons, in, matches(), and/or/not)")

    return build(tree)
