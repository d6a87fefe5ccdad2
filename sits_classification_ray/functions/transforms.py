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
