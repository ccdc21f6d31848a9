"""Vectorized expression predicates — the Aviator-expression analog.

The reference compiles JSON-configured property-filter strings with
AviatorEvaluator and evaluates them per element
(/root/reference/computer-algorithm/.../ExpressionUtil.java:28-52,
path/filter/PropertyFilterDescribe.java); ours compiles a restricted
Python expression ONCE per stage and evaluates it over whole numpy
columns at a time (same trust model as Aviator: expressions come from
the job author, not from data).

Allowed names: the variables the caller binds (e.g. ``node``, ``w_out``,
``w_in``) plus a numpy-safe builtin subset. Example predicates::

    Predicate("w_out >= w_in")(w_out=w2, w_in=w1)     # edge spread
    Predicate("node % 50 == 0")(node=ids)             # vertex condition
"""

from __future__ import annotations

import ast

import numpy as np

_ALLOWED_FUNCS = {
    "abs": np.abs, "minimum": np.minimum, "maximum": np.maximum,
    "where": np.where, "log": np.log, "exp": np.exp, "sqrt": np.sqrt,
    "floor": np.floor, "ceil": np.ceil,
}


def _validate(expression: str) -> None:
    """Reject attribute access, dunder names, lambdas/comprehensions and
    calls to anything but the allowed numpy subset — containment beyond
    the empty __builtins__ env (attribute traversal on bound arrays
    would otherwise escape it, ADVICE.md). Plain names stay open: they
    are the caller-bound columns, unknown at compile time."""
    for node in ast.walk(ast.parse(expression, mode="eval")):
        if isinstance(node, ast.Attribute):
            raise ValueError(
                f"attribute access not allowed in predicate: "
                f"{ast.unparse(node)!r}")
        if isinstance(node, (ast.Lambda, ast.ListComp, ast.SetComp,
                             ast.DictComp, ast.GeneratorExp,
                             ast.NamedExpr, ast.Await)):
            raise ValueError(
                f"{type(node).__name__} not allowed in predicate")
        if isinstance(node, ast.Name):
            if "__" in node.id:
                raise ValueError(f"disallowed name {node.id!r}")
        if isinstance(node, ast.Call):
            if not (isinstance(node.func, ast.Name)
                    and node.func.id in _ALLOWED_FUNCS):
                raise ValueError(
                    f"only {sorted(_ALLOWED_FUNCS)} are callable; got "
                    f"{ast.unparse(node.func)!r}")


class Predicate:
    """A compiled vectorized boolean expression over named columns."""

    def __init__(self, expression: str):
        self.expression = expression
        _validate(expression)
        # compile once; mode eval forbids statements/imports
        self._code = compile(expression, "<predicate>", "eval")

    def __call__(self, **cols) -> np.ndarray:
        env = {"__builtins__": {}}
        env.update(_ALLOWED_FUNCS)
        env.update(cols)
        out = eval(self._code, env)  # noqa: S307 — job-author expression
        return np.asarray(out, dtype=bool)

    def __repr__(self):
        return f"Predicate({self.expression!r})"
