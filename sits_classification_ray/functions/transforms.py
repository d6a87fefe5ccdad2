"""Value-transform scalar functions (M9/M10).

The reference normalizes features at read time (``X * 1e-4``,
``pytorch/utils/Dataset.py:217-218``) and responses forward/inverse
(``log10(y+1)`` ↔ ``10^p − 1``; ``y*k`` ↔ ``p/k``;
``pytorch/utils/Dataset.py:221-226``, ``pytorch/predict.py:521-525``).
Expressed here as vectorized Arrow batch transforms.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def scale_column(ds: rd.Dataset, col: str, factor: float,
                 out_col: str | None = None) -> rd.Dataset:
    """Forward normalization ``x * factor`` (M9)."""
    out = out_col or col

    def f(t: pa.Table) -> pa.Table:
        v = pc.multiply(pc.cast(t[col], pa.float64()), factor)
        return t.append_column(out, v) if out not in t.schema.names \
            else t.set_column(t.schema.get_field_index(out), out, v)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def unscale_column(ds: rd.Dataset, col: str, factor: float,
                   out_col: str | None = None) -> rd.Dataset:
    """Inverse of :func:`scale_column`: ``p / factor`` (M10)."""
    return scale_column(ds, col, 1.0 / factor, out_col)


def log1p10_column(ds: rd.Dataset, col: str,
                   out_col: str | None = None) -> rd.Dataset:
    """Forward response transform ``log10(y + 1)`` (M10 forward)."""
    out = out_col or col

    def f(t: pa.Table) -> pa.Table:
        v = pc.log10(pc.add(pc.cast(t[col], pa.float64()), 1.0))
        return t.append_column(out, v) if out not in t.schema.names \
            else t.set_column(t.schema.get_field_index(out), out, v)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def exp10m1_column(ds: rd.Dataset, col: str,
                   out_col: str | None = None) -> rd.Dataset:
    """Inverse response transform ``10^p − 1`` (M10 inverse,
    ``pytorch/predict.py:523``)."""
    out = out_col or col

    def f(t: pa.Table) -> pa.Table:
        v = pc.subtract(pc.power(10.0, pc.cast(t[col], pa.float64())), 1.0)
        return t.append_column(out, v) if out not in t.schema.names \
            else t.set_column(t.schema.get_field_index(out), out, v)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sql_round(x, ndigits: int = 6) -> "np.ndarray":
    """Round half AWAY FROM ZERO — SQL/DuckDB ``round`` semantics
    (``round(x·10ⁿ ± 0.5 toward sign) / 10ⁿ``), as opposed to
    ``np.round``'s IEEE half-to-even. The two differ exactly when a
    value lands on a representable half at the target digit, which the
    engine's dyadic-rational quotients (medians/MADs are integer
    halves, group means of integers) hit routinely — use this for
    every rounded column whose oracle is DuckDB SQL. NaN passes
    through."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    m = 10.0 ** ndigits
    y = x * m
    with np.errstate(invalid="ignore"):
        return np.copysign(np.floor(np.abs(y) + 0.5), y) / m


def norm_ppf(p):
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9 — the standard dependency-free Φ⁻¹). Used for
    the generalized-ESD critical values; deterministic closed form so
    the engine and the golden twin share bits."""
    import numpy as np

    p = np.asarray(p, dtype=np.float64)
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    out = np.empty_like(p)
    lo = p < plow
    hi = p > phigh
    mid = ~(lo | hi)
    if lo.any():
        q = np.sqrt(-2.0 * np.log(p[lo]))
        out[lo] = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q
                     + c[4]) * q + c[5])
                   / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q
                      + 1.0))
    if hi.any():
        q = np.sqrt(-2.0 * np.log(1.0 - p[hi]))
        out[hi] = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q
                      + c[4]) * q + c[5])
                    / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q
                       + 1.0))
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r
                      + a[4]) * r + a[5]) * q
                    / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                        + b[4]) * r + 1.0))
    return out
