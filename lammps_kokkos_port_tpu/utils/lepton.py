"""Tiny Lepton-expression evaluator for LEPTON-package styles.

The reference's LEPTON package compiles algebraic strings like
"k*(r-rc)^2;k=100.0" into potentials differentiated symbolically (ref:
src/LEPTON/fix_wall_lepton.cpp:38-47). Here the same grammar — a main
expression followed by ';'-separated named definitions, '^' for powers —
is parsed with the Python ast module into a jax-traceable function, and
the derivative comes from autodiff instead of symbolic differentiation
(identical values to fp roundoff for these smooth closed forms).
"""

from __future__ import annotations

import ast

import jax.numpy as jnp

_FNS = {
    "sqrt": jnp.sqrt, "exp": jnp.exp, "log": jnp.log, "sin": jnp.sin,
    "cos": jnp.cos, "tan": jnp.tan, "asin": jnp.arcsin,
    "acos": jnp.arccos, "atan": jnp.arctan, "sinh": jnp.sinh,
    "cosh": jnp.cosh, "tanh": jnp.tanh, "erf": None, "erfc": None,
    "abs": jnp.abs, "floor": jnp.floor, "ceil": jnp.ceil,
    "min": jnp.minimum, "max": jnp.maximum,
}

_OPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Pow: lambda a, b: a ** b,
}


def _eval_node(node, env):
    if isinstance(node, ast.Expression):
        return _eval_node(node.body, env)
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.Name):
        if node.id not in env:
            raise ValueError(f"unknown lepton symbol {node.id!r}")
        return env[node.id]
    if isinstance(node, ast.BinOp) and type(node.op) in _OPS:
        return _OPS[type(node.op)](_eval_node(node.left, env),
                                   _eval_node(node.right, env))
    if isinstance(node, ast.UnaryOp):
        v = _eval_node(node.operand, env)
        return -v if isinstance(node.op, ast.USub) else +v
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
        fn = _FNS.get(node.func.id)
        if fn is None:
            if node.func.id in ("erf", "erfc"):
                from jax.scipy.special import erf, erfc
                fn = erf if node.func.id == "erf" else erfc
            else:
                raise ValueError(f"unknown lepton fn {node.func.id!r}")
        return fn(*[_eval_node(a, env) for a in node.args])
    raise ValueError(f"unsupported lepton syntax: {ast.dump(node)}")


def lepton_fn(expr: str):
    """Compile a Lepton string into f(**vars) -> jnp value. The first
    ';'-chunk is the expression; later chunks are name=value definitions
    (which may reference earlier symbols)."""
    parts = [p.strip() for p in expr.split(";") if p.strip()]
    main = ast.parse(parts[0].replace("^", "**"), mode="eval")
    defs = []
    for p in parts[1:]:
        name, _, val = p.partition("=")
        defs.append((name.strip(),
                     ast.parse(val.strip().replace("^", "**"),
                               mode="eval")))

    def fn(**variables):
        env = dict(variables)
        for name, tree in defs:
            env[name] = _eval_node(tree, env)
        return _eval_node(main, env)

    return fn
