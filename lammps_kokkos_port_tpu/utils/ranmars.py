"""Marsaglia RANMAR RNG, jittable, stream-exact vs the reference.

The reference seeds every stochastic fix/compute with `RanMars` (Marsaglia
lagged-Fibonacci generator; RANMAR in F. James, Comp Phys Comm 60, 329
(1990); ref: src/random_mars.cpp). Its state is 97 doubles + a carry and
two lag indices — pure fp64 arithmetic — so it ports directly into jit:
`uniform` is branch-free index arithmetic, `gaussian` (Box-Muller polar
with the one-value cache) and the gamma deviate (rejection sampling) are
`lax.while_loop`s. The state pytree lives in `state.aux`, so stochastic
fixes stay inside the fused step like everything else.

Reproducing the exact draw SEQUENCE (including rejection retries and the
gaussian save/second cache) is what lets the fix-timestep goldens for
temp/csvr, temp/csld etc. pass digit-exact (ref:
unittest/force-styles/tests/fix-timestep-temp_csvr.yaml, epsilon 5e-14).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_CD = 7654321.0 / 16777216.0
_CM = 16777213.0 / 16777216.0


def ranmars_init(seed: int) -> dict:
    """Seed-to-state table construction (integer arithmetic on host),
    including the constructor's one discarded uniform draw
    (ref: random_mars.cpp:29-69)."""
    if seed <= 0 or seed > 900000000:
        raise ValueError("Invalid seed for Marsaglia random # generator")
    u = np.zeros(98)
    ij = (seed - 1) // 30082
    kl = (seed - 1) - 30082 * ij
    i = (ij // 177) % 177 + 2
    j = ij % 177 + 2
    k = (kl // 169) % 178 + 1
    l = kl % 169  # noqa: E741 — the published variable names
    for ii in range(1, 98):
        s, t = 0.0, 0.5
        for _ in range(24):
            m = ((i * j) % 179) * k % 179
            i, j, k = j, k, m
            l = (53 * l + 1) % 169  # noqa: E741
            if (l * m) % 64 >= 32:
                s += t
            t *= 0.5
        u[ii] = s
    rs = {
        "u": jnp.asarray(u, jnp.float64),
        "c": jnp.asarray(362436.0 / 16777216.0, jnp.float64),
        "i97": jnp.asarray(97, jnp.int32),
        "j97": jnp.asarray(33, jnp.int32),
        "save": jnp.asarray(0, jnp.int32),
        "second": jnp.asarray(0.0, jnp.float64),
    }
    _, rs = uniform(rs)  # constructor warm-up draw
    return rs


def uniform(rs: dict):
    """One uniform in [0,1); returns (value, new state)."""
    u, i97, j97 = rs["u"], rs["i97"], rs["j97"]
    uni = u[i97] - u[j97]
    uni = jnp.where(uni < 0.0, uni + 1.0, uni)
    u = u.at[i97].set(uni)
    i97 = jnp.where(i97 == 1, 97, i97 - 1)
    j97 = jnp.where(j97 == 1, 97, j97 - 1)
    c = rs["c"] - _CD
    c = jnp.where(c < 0.0, c + _CM, c)
    out = uni - c
    out = jnp.where(out < 0.0, out + 1.0, out)
    return out, {**rs, "u": u, "c": c, "i97": i97, "j97": j97}


def gaussian(rs: dict):
    """Polar Box-Muller with the reference's one-value cache."""

    def fresh(rs):
        def cond(carry):
            _, _, _, rsq = carry
            return (rsq >= 1.0) | (rsq == 0.0)

        def body(carry):
            rs = carry[0]
            a, rs = uniform(rs)
            b, rs = uniform(rs)
            v1, v2 = 2.0 * a - 1.0, 2.0 * b - 1.0
            return (rs, v1, v2, v1 * v1 + v2 * v2)

        rs, v1, v2, rsq = lax.while_loop(
            cond, body, (rs, 0.0, 0.0, jnp.asarray(2.0, jnp.float64)))
        fac = jnp.sqrt(-2.0 * jnp.log(rsq) / rsq)
        return v2 * fac, {**rs, "save": jnp.asarray(1, jnp.int32),
                          "second": v1 * fac}

    def cached(rs):
        return rs["second"], {**rs, "save": jnp.asarray(0, jnp.int32)}

    return lax.cond(rs["save"] == 0, fresh, cached, rs)


def gamdev(rs: dict, ia: int):
    """Gamma(ia) deviate, draw-for-draw the reference's rejection scheme
    (ref: fix_temp_csvr.cpp:238-277). `ia` must be a static Python int
    (it is a group DOF count, fixed at trace time)."""
    ia = int(ia)
    if ia < 1:
        return jnp.zeros((), jnp.float64), rs
    if ia < 6:
        x = jnp.ones((), jnp.float64)
        for _ in range(ia):
            un, rs = uniform(rs)
            x = x * un
        x = jnp.where(x < 2.2250759805e-308, 708.4, -jnp.log(x))
        return x, rs

    am = float(ia - 1)
    s = float(np.sqrt(2.0 * am + 1.0))

    def cond(carry):
        return ~carry[2]

    def body(carry):
        rs = carry[0]

        def icond(c):
            _, v1, v2 = c
            return v1 * v1 + v2 * v2 > 1.0

        def ibody(c):
            rs = c[0]
            v1, rs = uniform(rs)
            b, rs = uniform(rs)
            return (rs, v1, 2.0 * b - 1.0)

        rs, v1, v2 = lax.while_loop(
            icond, ibody,
            (rs, jnp.asarray(2.0, jnp.float64), jnp.asarray(2.0, jnp.float64)))
        y = v2 / v1
        x = s * y + am
        xs = jnp.where(x > 0.0, x, 1.0)
        lg = am * jnp.log(xs / am) - s * y
        # x<=0 repeats the draw loop; lg<-700 or tiny v1 is the `goto
        # restart` — neither consumes the acceptance uniform
        ok = (x > 0.0) & ~((lg < -700.0) | (v1 < 0.00001))

        def echeck(rs):
            un, rs = uniform(rs)
            e = (1.0 + y * y) * jnp.exp(lg)
            return rs, un <= e

        rs, acc = lax.cond(ok, echeck,
                           lambda rs: (rs, jnp.asarray(False)), rs)
        return (rs, x, acc)

    rs, x, _ = lax.while_loop(
        cond, body,
        (rs, jnp.zeros((), jnp.float64), jnp.asarray(False)))
    return x, rs


def sumnoises(rs: dict, nn: int):
    """Sum of nn squared gaussian noises via the gamma-deviate shortcut
    (ref: fix_temp_csvr.cpp:285-296). nn static."""
    nn = int(nn)
    if nn == 0:
        return jnp.zeros((), jnp.float64), rs
    if nn == 1:
        rr, rs = gaussian(rs)
        return rr * rr, rs
    if nn % 2 == 0:
        g, rs = gamdev(rs, nn // 2)
        return 2.0 * g, rs
    rr, rs = gaussian(rs)
    g, rs = gamdev(rs, (nn - 1) // 2)
    return 2.0 * g + rr * rr, rs
