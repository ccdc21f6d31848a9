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

import numpy as np

_ALLOWED_FUNCS = {
    "abs": np.abs, "minimum": np.minimum, "maximum": np.maximum,
    "where": np.where, "log": np.log, "exp": np.exp, "sqrt": np.sqrt,
    "floor": np.floor, "ceil": np.ceil,
}


class Predicate:
    """A compiled vectorized boolean expression over named columns."""

    def __init__(self, expression: str):
        self.expression = expression
        # compile once; mode eval forbids statements/imports
        self._code = compile(expression, "<predicate>", "eval")
        for name in self._code.co_names:
            if name not in _ALLOWED_FUNCS and not name.isidentifier():
                raise ValueError(f"disallowed name {name!r}")

    def __call__(self, **cols) -> np.ndarray:
        env = {"__builtins__": {}}
        env.update(_ALLOWED_FUNCS)
        env.update(cols)
        out = eval(self._code, env)  # noqa: S307 — job-author expression
        return np.asarray(out, dtype=bool)

    def __repr__(self):
        return f"Predicate({self.expression!r})"
