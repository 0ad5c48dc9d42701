"""64-bit-bitcast-free formulations of the bit-twiddling ufuncs.

TPU has no 64-bit ALU: under ``jax_enable_x64`` XLA rewrites every f64/s64
op out of the program, but that rewrite pass has no rule for
``bitcast-convert`` on 64-bit types, so the jnp natives for ``signbit``,
``copysign``, ``ldexp``, ``frexp``, ``nextafter`` and ``spacing`` (all
implemented via f64<->s64 bitcasts) fail to COMPILE on TPU for f64 inputs
(observed: "While rewriting computation to not contain X64 element types
... %bitcast_convert_type = s64[...]").  Parity target: the reference's
ufunc table (``/root/reference/dask_array/_ufunc.py``) supports these on
f64 without restriction.

These wrappers keep the jnp natives on every platform/dtype where they
compile, and switch to arithmetic formulations (no bitcasts) only for
64-bit floats on TPU:

- ``signbit``/``copysign``: exact (the -0.0 case is recovered via the sign
  of 1/x).
- ``ldexp``/``frexp``: exact for normal values (exponent arithmetic via
  ``exp2``, which is exact on integral inputs; two-step scaling keeps the
  intermediate factors finite; a one-step correction absorbs ``log2``
  rounding at power-of-two boundaries).
- ``nextafter``/``spacing``: computed at f32 granularity.  The TPU's f64
  emulation carries ~1e-15 relative error through multiply chains
  (measured), so exact ulp-stepping at f64 granularity is not reliable;
  f32 granularity is the step size that is guaranteed to actually move
  the value on this hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _use_safe(*vals) -> bool:
    """True when any operand is a 64-bit float and the backend is TPU."""
    if jax.default_backend() != "tpu":
        return False
    for v in vals:
        dt = getattr(v, "dtype", None)
        if dt is None:
            dt = np.asarray(v).dtype
        if dt.itemsize == 8 and np.issubdtype(dt, np.floating):
            return True
    return False


def _exp2_int(n, dtype):
    """Exact 2.0**n for integer-valued ``n`` (|n| <= 1022), no bitcasts.

    XLA's ``exp2`` is a libm approximation (observed ~1e-14 relative error
    at integral f64 arguments), so powers of two are built by repeated
    squaring: every factor is a power of two, every multiply is exact, and
    the per-element base freezes once its exponent bits are consumed (so
    the largest intermediate is 2**512, never inf).
    """
    n = jnp.asarray(n)
    m = jnp.abs(n).astype(jnp.int32)
    neg = n < 0
    base = jnp.full(m.shape, 2.0, dtype)
    out = jnp.ones(m.shape, dtype)
    for _ in range(10):
        out = jnp.where((m & 1) == 1, out * base, out)
        m = m >> 1
        base = jnp.where(m > 0, base * base, base)
    return jnp.where(neg, 1.0 / out, out)


def _signbit_arith(v):
    # -0.0: 1/-0.0 == -inf < 0; NaN compares false everywhere -> False
    return jnp.where(v == 0, 1.0 / v < 0, v < 0)


def signbit(v):
    if _use_safe(v):
        return _signbit_arith(jnp.asarray(v))
    return jnp.signbit(v)


def copysign(x, y):
    if _use_safe(x, y):
        dt = jnp.result_type(x, y)
        mag = jnp.abs(jnp.asarray(x)).astype(dt)
        return jnp.where(_signbit_arith(jnp.asarray(y).astype(dt)), -mag, mag)
    return jnp.copysign(x, y)


def ldexp(x, n):
    if _use_safe(x):
        x = jnp.asarray(x)
        n = jnp.asarray(n)
        # |n| beyond 2097 (min-subnormal -> max-normal span) saturates for
        # every input; clamping keeps all three factors finite
        n = jnp.clip(n.astype(jnp.int32), -2097, 2097)
        # three SAME-SIGN factors (|t| <= 699): monotone scaling, so an
        # intermediate never dips subnormal and bounces back (double
        # rounding), and no factor overflows
        t = jnp.sign(n) * (jnp.abs(n) // 3)
        r = n - 2 * t
        st = _exp2_int(t, x.dtype)
        return ((x * st) * st) * _exp2_int(r, x.dtype)
    return jnp.ldexp(x, n)


def _frexp_arith(v):
    a = jnp.abs(v)
    finite = jnp.isfinite(v) & (v != 0)
    e = jnp.where(finite, jnp.floor(jnp.log2(jnp.where(finite, a, 1.0))) + 1.0, 0.0)
    # two same-sign factors (exact powers of two; |e| <= 1075 so each
    # factor's exponent stays <= 538, well inside normal range)
    h = jnp.trunc(e / 2)
    m = (v * _exp2_int(-h, v.dtype)) * _exp2_int(-(e - h), v.dtype)
    # log2 can round either way at exact powers of two: one step fixes it
    big = finite & (jnp.abs(m) >= 1.0)
    m = jnp.where(big, m / 2, m)
    e = e + big
    small = finite & (jnp.abs(m) < 0.5)
    m = jnp.where(small, m * 2, m)
    e = e - small
    m = jnp.where(finite, m, v)
    return m, e.astype(jnp.int32)


def frexp_mantissa(v):
    if _use_safe(v):
        return _frexp_arith(jnp.asarray(v))[0]
    return jnp.frexp(v)[0]


def frexp_exponent(v):
    if _use_safe(v):
        return _frexp_arith(jnp.asarray(v))[1]
    return jnp.frexp(v)[1]


def nextafter(x, y):
    if _use_safe(x, y):
        x = jnp.asarray(x)
        dt = jnp.result_type(x, y)
        out32 = jnp.nextafter(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
        )
        return out32.astype(dt)
    return jnp.nextafter(x, y)


def spacing(v):
    if _use_safe(v):
        v = jnp.asarray(v)
        return jnp.spacing(v.astype(jnp.float32)).astype(v.dtype)
    return jnp.spacing(v)
