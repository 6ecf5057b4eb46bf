"""Fixed-step explicit Runge–Kutta integrators.

Reimplements the fixed-step solver set the reference exposes through
torchdiffeq (whitelist in src/nodes/__init__.py:15-23): euler, midpoint,
rk4 (torchdiffeq's rk4 is the 3/8-rule variant), heun2, heun3 — as Butcher
tableaus driven by a single ``lax.scan``.  Tolerances (atol/rtol) are
accepted for API parity but ignored, exactly as torchdiffeq ignores them for
fixed-grid methods.

Semantics: ``odeint_fixed(f, y0, ts)`` integrates over the *given* time grid
— ``len(ts)`` points means ``len(ts) - 1`` steps (so the reference's
``nfe=10`` ⇒ 9 Euler steps; reference: FLOAT.py:188,247).

TPU notes: the whole trajectory is one scan whose body inlines the vector
field; under jit, XLA compiles a single fused loop with static shapes.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# Butcher tableaus: (c_i offsets, a_ij rows, b weights).
ODE_TABLEAUS: dict[str, tuple] = {
    "euler": ((), (), (1.0,)),
    "midpoint": ((0.5,), ((0.5,),), (0.0, 1.0)),
    "heun2": ((1.0,), ((1.0,),), (0.5, 0.5)),
    "heun3": ((1 / 3, 2 / 3), ((1 / 3,), (0.0, 2 / 3)), (0.25, 0.0, 0.75)),
    # torchdiffeq 'rk4' = classic fourth order with the 3/8 rule
    "rk4": (
        (1 / 3, 2 / 3, 1.0),
        ((1 / 3,), (-1 / 3, 1.0), (1.0, -1.0, 1.0)),
        (1 / 8, 3 / 8, 3 / 8, 1 / 8),
    ),
}


def _rk_step(f: Callable, t0, dt, y0, method: str):
    cs, a_rows, bs = ODE_TABLEAUS[method]
    ks = [f(t0, y0)]
    for c, row in zip(cs, a_rows):
        yi = y0
        for aij, kj in zip(row, ks):
            if aij != 0.0:
                yi = yi + dt * aij * kj
        ks.append(f(t0 + c * dt, yi))
    dy = None
    for bj, kj in zip(bs, ks):
        if bj == 0.0:
            continue
        term = dt * bj * kj
        dy = term if dy is None else dy + term
    # keep the state dtype: an f32 time grid would otherwise promote a
    # reduced-precision state (sampler_dtype=bfloat16) to f32 mid-scan
    return (y0 + dy).astype(y0.dtype)


def odeint_fixed(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    method: str = "euler",
    return_trajectory: bool = False,
):
    """Integrate dy/dt = f(t, y) over grid ``ts``; returns y(ts[-1]).

    With ``return_trajectory`` returns the full (len(ts), *y0.shape) stack
    (position 0 is y0), matching torchdiffeq's output layout.
    """
    if method not in ODE_TABLEAUS:
        raise ValueError(f"unknown ODE method {method!r}; options: {list(ODE_TABLEAUS)}")

    t0s = ts[:-1]
    t1s = ts[1:]

    def body(y, tt):
        t0, t1 = tt
        y1 = _rk_step(f, t0, t1 - t0, y, method)
        return y1, (y1 if return_trajectory else None)

    y_final, traj = jax.lax.scan(body, y0, (t0s, t1s))
    if return_trajectory:
        return jnp.concatenate([y0[None], traj], axis=0)
    return y_final
