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
    "recip": lambda x: 1.0 / x, "square": lambda x: x * x,
    "cube": lambda x: x * x * x,
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
        fn = env.get("__fns__", {}).get(node.func.id) or _FNS.get(
            node.func.id)
        if fn is None:
            if node.func.id in ("erf", "erfc"):
                from jax.scipy.special import erf, erfc
                fn = erf if node.func.id == "erf" else erfc
            else:
                raise ValueError(f"unknown lepton fn {node.func.id!r}")
        return fn(*[_eval_node(a, env) for a in node.args])
    raise ValueError(f"unsupported lepton syntax: {ast.dump(node)}")


def zbl_expr_fn(qqr2e, qelectron=1.0, angstrom=1.0):
    """The LEPTON package's zbl(zi, zj, r) extension function
    (ref: src/LEPTON/lepton_utils.cpp ZBLFunction::evaluate) — units
    constants are captured at construction; jax autodiff reproduces its
    hand-coded derivative exactly."""
    C = (0.02817, 0.28022, 0.50986, 0.18175)
    D = (0.20162, 0.40290, 0.94229, 3.19980)

    def zbl(zi, zj, r):
        rbya = r * (zi ** 0.23 + zj ** 0.23) / (0.46850 * angstrom)
        s = sum(c * jnp.exp(-d * rbya) for c, d in zip(C, D))
        return zi * zj * qqr2e * qelectron * qelectron / r * s

    return zbl


def lepton_fn(expr: str, fns=None):
    """Compile a Lepton string into f(**vars) -> jnp value. The first
    ';'-chunk is the expression; later chunks are name=value definitions
    (which may reference earlier symbols). `fns` adds extension functions
    (e.g. the LEPTON package's zbl())."""
    # literal backslash escapes (\t, \n) appear in some reference
    # expressions (e.g. the lepton fixtures) — treat them as whitespace
    expr = expr.replace("\\t", " ").replace("\\n", " ")
    parts = [p.strip() for p in expr.split(";") if p.strip()]
    main = ast.parse(parts[0].replace("^", "**"), mode="eval")
    defs = []
    for p in parts[1:]:
        name, _, val = p.partition("=")
        defs.append((name.strip(),
                     ast.parse(val.strip().replace("^", "**"),
                               mode="eval")))

    trees = dict(defs)

    class _LazyEnv(dict):
        """Definitions may reference LATER definitions (Lepton resolves
        names lazily, e.g. "lj+coul;lj=4*eps*...;eps=0.02"): evaluate a
        definition on first lookup."""

        def __contains__(self, k):
            return dict.__contains__(self, k) or k in trees

        def __getitem__(self, k):
            if not dict.__contains__(self, k):
                if k not in trees:
                    raise KeyError(k)
                self[k] = _eval_node(trees[k], self)
            return dict.__getitem__(self, k)

    def fn(**variables):
        env = _LazyEnv(variables)
        if fns:
            env["__fns__"] = fns
        return _eval_node(main, env)

    return fn
