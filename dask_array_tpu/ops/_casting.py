"""dtype casting as an elementwise expression."""

from __future__ import annotations

import numpy as np

from dask_array_tpu._blockwise import Elemwise


def _astype(x, dtype=None, src_dtype=None):
    from dask_array_tpu._chunks import device_dtype, host_only_dtype

    dt = np.dtype(dtype)
    if isinstance(x, np.ndarray):
        # host path (meta probes, eager numpy blocks): numpy's own cast IS
        # the reference semantics, units and wrap rules included
        return x.astype(dt)
    src = np.dtype(src_dtype) if src_dtype is not None else np.dtype(x.dtype)
    if host_only_dtype(dt):
        # host-only target dtype (object/str/structured): the cast itself is
        # a host operation — the result has no device representation
        return np.asarray(x).astype(dt)
    if dt.kind == "u" and np.issubdtype(src, np.floating):
        # numpy float->unsigned casts truncate toward zero then wrap
        # modularly; XLA's convert clamps negatives to 0 — route through
        # int64 (truncates) then to unsigned (bit-truncation wraps)
        return x.astype(np.int64).astype(dt)
    if src.kind in "Mm" and dt.kind in "Mm":
        return _convert_ticks(x, src, dt)
    return x.astype(device_dtype(dt))


# fixed-length datetime units, in seconds (calendar units M/Y are separate)
_LINEAR_SECONDS = {
    "W": 604800, "D": 86400, "h": 3600, "m": 60, "s": 1,
    "ms": (1, 10**3), "us": (1, 10**6), "ns": (1, 10**9),
    "ps": (1, 10**12), "fs": (1, 10**15), "as": (1, 10**18),
}


def _unit_ratio(src_u, dst_u):
    """(mul, div) integer ratio for linear-unit tick conversion."""
    def frac(u):
        v = _LINEAR_SECONDS[u]
        return v if isinstance(v, tuple) else (v, 1)

    sn, sd = frac(src_u)
    dn, dd = frac(dst_u)
    # ticks_dst = ticks_src * (sn/sd) / (dn/dd) = ticks_src * sn*dd / (sd*dn)
    num = sn * dd
    den = sd * dn
    g = np.gcd(num, den)
    return num // g, den // g


def _days_to_months(days, jnp):
    """Civil calendar: day-count since 1970-01-01 -> month-count since 1970-01.

    Howard Hinnant's ``civil_from_days`` in integer jnp ops (calendar units
    are not linear in days — numpy converts via the civil calendar)."""
    z = days.astype(np.int64) + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = jnp.floor_divide(doe - jnp.floor_divide(doe, 1460) + jnp.floor_divide(doe, 36524) - jnp.floor_divide(doe, 146096), 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100))
    mp = jnp.floor_divide(5 * doy + 2, 153)
    m = mp + jnp.where(mp < 10, 3, -9)  # 1..12
    y = y + jnp.where(m <= 2, 1, 0)
    return (y - 1970) * 12 + (m - 1)


def _months_to_days(months, jnp):
    """First day of the month: month-count since 1970-01 -> day-count."""
    m0 = months.astype(np.int64)
    y = 1970 + jnp.floor_divide(m0, 12)
    m = jnp.mod(m0, 12) + 1  # 1..12
    y_adj = y - jnp.where(m <= 2, 1, 0)
    era = jnp.floor_divide(y_adj, 400)
    yoe = y_adj - era * 400
    mp = m + jnp.where(m > 2, -3, 9)
    doy = jnp.floor_divide(153 * mp + 2, 5)
    doe = yoe * 365 + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100) + doy
    return era * 146097 + doe - 719468


def _convert_ticks(x, src, dt):
    """datetime-shim unit conversion on int64 ticks (device path)."""
    import jax.numpy as jnp

    src_u = np.datetime_data(src)[0]
    dst_u = np.datetime_data(dt)[0]
    ticks = x.astype(np.int64)
    cal = {"M", "Y"}
    if src_u == dst_u:
        return ticks
    if src_u not in cal and dst_u not in cal:
        mul, div = _unit_ratio(src_u, dst_u)
        out = ticks * mul
        return jnp.floor_divide(out, div) if div != 1 else out
    if dt.kind == "M" and src.kind == "M":
        # absolute datetimes: calendar conversion through days/months
        if src_u in cal and dst_u in cal:
            if src_u == "Y":
                return ticks * 12 if dst_u == "M" else ticks
            return jnp.floor_divide(ticks, 12)  # M -> Y
        if src_u in cal:
            months = ticks * 12 if src_u == "Y" else ticks
            days = _months_to_days(months, jnp)
            mul, div = _unit_ratio("D", dst_u)
            out = days * mul
            return jnp.floor_divide(out, div) if div != 1 else out
        # linear -> calendar: floor to days, then civil
        mul, div = _unit_ratio(src_u, "D")
        days = jnp.floor_divide(ticks * mul, div) if div != 1 else ticks * mul
        months = _days_to_months(days, jnp)
        return jnp.floor_divide(months, 12) if dst_u == "Y" else months
    # timedelta with calendar units: numpy's unsafe-cast average ratio
    one = np.timedelta64(1, src_u).astype(f"m8[{dst_u}]", casting="unsafe")
    r = int(one.view("i8"))
    if r >= 1:
        return ticks * r
    inv = int(np.timedelta64(1, dst_u).astype(f"m8[{src_u}]", casting="unsafe").view("i8"))
    return jnp.floor_divide(ticks, inv)


def astype_expr(expr, dtype):
    dtype = np.dtype(dtype)
    if expr.dtype == dtype:
        return expr
    # np.dtype objects, NOT .str: ml_dtypes collapse to ambiguous void
    # codes as strings (bfloat16 -> "<V2") and would decode as raw void
    return Elemwise(_astype, (("dtype", np.dtype(dtype)), ("src_dtype", np.dtype(expr.dtype))), expr)
