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
    """Returns fn(step[, delta[, elapsed]]) — delta is the run-window
    ramp fraction, elapsed = (step - beginstep)*dt; both default 0 and
    are needed only by ramp()/vdisplace() (ref: Variable functions)."""
    tree = _ast.parse(expr.replace("^", "**"), mode="eval")
    ELAPSED = [0.0]

    def ev(node, step, delta=0.0):
        if isinstance(node, _ast.Expression):
            return ev(node.body, step, delta)
        if isinstance(node, _ast.Call):
            fid = getattr(node.func, "id", None)
            if fid == "ramp":
                lo = ev(node.args[0], step, delta)
                hi = ev(node.args[1], step, delta)
                return lo + delta * (hi - lo)
            if fid == "vdisplace" and dt is not None:
                # vdisplace(c0, v) = c0 + v * elapsed-time-in-run
                # (ref: Variable vdisplace(); elapsed from beginstep)
                c0 = ev(node.args[0], step, delta)
                vv = ev(node.args[1], step, delta)
                return c0 + vv * ELAPSED[0]
            raise ValueError("unsupported function")
        if isinstance(node, _ast.Constant):
            return float(node.value)
        if isinstance(node, _ast.Name):
            if node.id == "step":
                return step
            if node.id == "time" and dt is not None:
                return step * dt
            raise ValueError(f"unsupported name {node.id}")
        if isinstance(node, _ast.BinOp):
            a = ev(node.left, step, delta)
            b = ev(node.right, step, delta)
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
            v = ev(node.operand, step, delta)
            if isinstance(node.op, _ast.USub):
                return -v
            if isinstance(node.op, _ast.UAdd):
                return v
        raise ValueError(f"unsupported expression node {node}")

    # probe once for parse errors with a dummy float
    ev(tree, 0.0, 0.0)

    def run(step, delta=0.0, elapsed=0.0):
        ELAPSED[0] = elapsed
        return ev(tree, step, delta)

    return run
