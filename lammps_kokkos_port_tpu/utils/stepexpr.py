"""Tiny equal-style-variable expression compiler for use INSIDE the
jitted step.

The interpreter's host-side equal variables evaluate lazily at
substitution time; fixes that take `v_name` arguments need the value at
EVERY timestep inside the compiled segment (ref: Variable::compute_equal
called from fix post_force hooks). This compiles the supported grammar
(numbers, `step`, `time` = step*dt via closure, + - * / ** and
parentheses) into a step->value closure of pure jnp ops.
"""

from __future__ import annotations

import ast as _ast


def compile_equal(expr: str, dt: float | None = None):
    tree = _ast.parse(expr.replace("^", "**"), mode="eval")

    def ev(node, step):
        if isinstance(node, _ast.Expression):
            return ev(node.body, step)
        if isinstance(node, _ast.Constant):
            return float(node.value)
        if isinstance(node, _ast.Name):
            if node.id == "step":
                return step
            if node.id == "time" and dt is not None:
                return step * dt
            raise ValueError(f"unsupported name {node.id}")
        if isinstance(node, _ast.BinOp):
            a = ev(node.left, step)
            b = ev(node.right, step)
            if isinstance(node.op, _ast.Add):
                return a + b
            if isinstance(node.op, _ast.Sub):
                return a - b
            if isinstance(node.op, _ast.Mult):
                return a * b
            if isinstance(node.op, _ast.Div):
                return a / b
            if isinstance(node.op, _ast.Pow):
                return a ** b
            raise ValueError(f"unsupported op {node.op}")
        if isinstance(node, _ast.UnaryOp):
            v = ev(node.operand, step)
            if isinstance(node.op, _ast.USub):
                return -v
            if isinstance(node.op, _ast.UAdd):
                return v
        raise ValueError(f"unsupported expression node {node}")

    # probe once for parse errors with a dummy float
    ev(tree, 0.0)
    return lambda step: ev(tree, step)
