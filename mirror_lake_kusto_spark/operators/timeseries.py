"""Kusto ``make-series`` and series functions, Spark-first.

``make-series`` is Kusto's flagship time-series operator: per group,
aggregate onto a REGULAR time grid (fixed step, explicit [start, stop)
range) and return the whole series as aligned arrays, filling empty
slots with a default.  The reference's ecosystem leans on it for every
time-chart; an engine claiming dialect parity needs it as a first-class
operator (SURVEY §2.I/§2.D adjacents).

Scale posture: the heavy input is reduced FIRST by a (keys, slot)
groupBy — partial aggregation map-side, one shuffle keyed by
(group, slot) — and only then joined against the key×grid frame, whose
size is |groups| × n_slots (independent of input row count).  The grid
join co-partitions on the same composite key, and the final per-group
collect_list gathers n_slots elements per group — bounded by the
requested grid, never by the data.  No driver-side loops, no Python
UDFs: the grid is ``sequence``+``explode``, array assembly is
``array_sort(collect_list(struct(...)))`` + ``transform``, all
whole-stage-codegen expressions.

Series post-processing (``series_moving_avg``, ``series_stats``) runs
as JVM higher-order functions over the arrays — no shuffle at all.
"""

from __future__ import annotations

import datetime

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

__all__ = [
    "make_series",
    "series_moving_avg",
    "series_stats",
    "series_fill_forward",
    "series_fill_linear",
    "series_outliers",
]


def _us(ts: datetime.datetime) -> int:
    return int(ts.timestamp() * 1_000_000)


def make_series(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, Column],
    start: datetime.datetime,
    stop: datetime.datetime,
    step: datetime.timedelta,
    by: list[str] | None = None,
    defaults: dict[str, float | int] | None = None,
    axis_col: str = "ts_axis",
) -> DataFrame:
    """Aggregate ``df`` onto the regular grid ``[start, stop)`` with
    ``step`` spacing, per ``by`` group, returning one row per group:
    ``by..., axis_col: array<timestamp>, <agg>: array<...>`` with
    missing slots filled from ``defaults`` (null when unspecified —
    Kusto's make-series default).

    Groups are the distinct ``by`` tuples present in the FILTERED input
    (Kusto semantics: make-series only emits series for groups with at
    least one row in range).
    """
    by = list(by or [])
    defaults = defaults or {}
    start_us, stop_us = _us(start), _us(stop)
    step_us = int(step.total_seconds() * 1_000_000)
    if step_us <= 0 or stop_us <= start_us:
        raise ValueError("make_series needs stop > start and step > 0")
    n_slots = -(-(stop_us - start_us) // step_us)  # ceil

    in_range = df.filter(
        (F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(stop))
    )
    slot_k = (
        F.floor((F.unix_micros(F.col(ts_col)) - start_us) / step_us)
        .cast("int")
        .alias("__k")
    )
    agg = in_range.groupBy(*by, slot_k).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    # analysis-only (no job): the aggregate value types, for typed
    # null gap-fill literals below
    agg_types = {
        f.name: f.dataType.simpleString()
        for f in agg.schema.fields
        if f.name in aggs
    }

    # ONE input pass (r12, guide §2.4): groups and slot values both
    # come from the aggregate itself.  The old shape re-scanned the
    # input for the distinct group list, exploded a |groups| x n_slots
    # grid, left-joined the aggregate back and re-grouped — two input
    # scans, a join and an extra shuffle.  Instead each group packs
    # its OBSERVED slots (bounded by n_slots — metadata-scale at any
    # input size) into a slot-index-sorted struct array, and each
    # dense series is built by an O(n_slots) sparse-to-dense run
    # construction: per observed entry emit [value, gap-fill x (next_k
    # - k - 1)], flatten, pad the lead.  (A map_from_entries + per-
    # slot lookup variant was built first and measured SLOWER at fine
    # grids: Catalyst's map element_at is a linear scan, making it
    # O(n_slots^2) per group.)  Global (no ``by``) aggregation always
    # returns one row, so the empty-input shape — full axis,
    # all-default series — is preserved.
    entries = F.array_sort(
        F.collect_list(
            F.struct(F.col("__k"), *[F.col(n) for n in aggs])
        )
    ).alias("__e")
    rows = agg.groupBy(*by).agg(entries) if by else agg.agg(entries)

    def _axis():
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_slots - 1)),
            lambda i: F.timestamp_micros(
                i.cast("bigint") * step_us + start_us
            ),
        )

    def _series(name):
        fill = (
            F.lit(defaults[name])
            if defaults.get(name) is not None
            else F.lit(None).cast(agg_types[name])
        )
        e_arr = F.col("__e")
        m = F.size(e_arr)
        ks = F.transform(e_arr, lambda e: e["__k"])
        # next observed index per entry (the last entry's "next" is
        # n_slots), sizes stay aligned for zip_with
        nxt = F.concat(
            F.slice(ks, 2, F.greatest(m - 1, F.lit(0))),
            F.array(F.lit(n_slots)),
        )
        val = (
            (lambda e: F.coalesce(e[name], fill))
            if defaults.get(name) is not None
            else (lambda e: e[name])
        )
        body = F.flatten(
            F.zip_with(
                e_arr,
                nxt,
                lambda e, nk: F.concat(
                    F.array(val(e)),
                    F.array_repeat(fill, nk - e["__k"] - 1),
                ),
            )
        )
        lead = F.array_repeat(fill, F.try_element_at(ks, F.lit(1)))
        return F.when(
            m == 0, F.array_repeat(fill, F.lit(n_slots))
        ).otherwise(F.concat(lead, body))

    return rows.select(
        *by,
        _axis().alias(axis_col),
        *[_series(name).alias(name) for name in aggs],
    )


def series_moving_avg(arr: Column | str, window: int) -> Column:
    """Trailing moving average over a series array (JVM higher-order
    expression, no shuffle): out[i] = avg(arr[max(0, i-window+1) .. i])."""
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(
        a,
        lambda x, i: F.aggregate(
            F.slice(
                a,
                F.greatest(i - window + 2, F.lit(1)),
                F.least(i + 1, F.lit(window)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double"),
        )
        / F.least(i + 1, F.lit(window)),
    )


def _prev_next_idx(mask):
    """Vectorized (prev, next) non-null index per position: -1 / n
    sentinels where none exists."""
    import numpy as np

    n = len(mask)
    idx = np.arange(n)
    prev = np.where(~mask, idx, -1)
    np.maximum.accumulate(prev, out=prev)
    nxt = np.where(~mask[::-1], idx[::-1], n)
    np.minimum.accumulate(nxt, out=nxt)
    return prev, nxt[::-1]


def _kernel_fill_forward(col: "pd.Series") -> "pd.Series":
    import numpy as np

    out = []
    for v in col:
        if v is None:
            out.append(None)
            continue
        x = np.array([np.nan if e is None else float(e) for e in v])
        mask = np.isnan(x)
        prev, _ = _prev_next_idx(mask)
        filled = np.where(prev >= 0, x[np.maximum(prev, 0)], np.nan)
        out.append([None if np.isnan(e) else float(e) for e in filled])
    return pd.Series(out)


def _kernel_fill_backward(col: "pd.Series") -> "pd.Series":
    """Mirror image of ``_kernel_fill_forward``: nulls take the next
    FOLLOWING non-null value; trailing nulls stay null."""
    rev = pd.Series([None if v is None else list(v)[::-1] for v in col])
    filled = _kernel_fill_forward(rev)
    return pd.Series(
        [None if v is None else list(v)[::-1] for v in filled]
    )


def _kernel_fill_linear(col: "pd.Series") -> "pd.Series":
    import numpy as np

    out = []
    for v in col:
        if v is None:
            out.append(None)
            continue
        x = np.array([np.nan if e is None else float(e) for e in v])
        n = len(x)
        mask = np.isnan(x)
        if mask.all() or not mask.any():
            out.append([None if np.isnan(e) else float(e) for e in x])
            continue
        prev, nxt = _prev_next_idx(mask)
        pv = x[np.maximum(prev, 0)]
        nv = x[np.minimum(nxt, n - 1)]
        idx = np.arange(n)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = (idx - prev) / np.maximum(nxt - prev, 1)
            interp = pv + (nv - pv) * frac
        res = np.where(
            ~mask,
            x,
            np.where(prev < 0, nv, np.where(nxt >= n, pv, interp)),
        )
        out.append([None if np.isnan(e) else float(e) for e in res])
    return pd.Series(out)


def _kernel_outliers(col: "pd.Series") -> "pd.Series":
    import numpy as np

    out = []
    for v in col:
        if v is None:
            out.append(None)
            continue
        x = np.array([np.nan if e is None else float(e) for e in v])
        nn = np.sort(x[~np.isnan(x)])
        n = len(nn)
        if n == 0:
            out.append([0.0] * len(x))
            continue

        def q(p: float) -> float:
            return float(nn[max(int(np.ceil(n * p)), 1) - 1])

        med, iqr = q(0.5), q(0.75) - q(0.25)
        if iqr == 0:
            out.append([0.0] * len(x))
            continue
        out.append([0.0 if np.isnan(e) else (e - med) / iqr for e in x])
    return pd.Series(out)


def _seq_mean(vals) -> float:
    """Sequential left-to-right double mean — matches the accumulation
    order of Spark's whole-partition window AVG (numpy's pairwise
    summation would differ in the last ulp, and the decompose oracle
    comparisons are bit-exact)."""
    s, n = 0.0, 0
    for v in vals:
        if v == v:  # not nan
            s += float(v)
            n += 1
    return s / n if n else float("nan")


def _detect_period(x) -> int:
    """Deterministic auto-seasonality (Kusto's ``period=-1``): the lag
    in [2, n//2] with the highest normalized autocorrelation of the
    null-as-0 series — the same r(L) profile as series_periods_detect
    (n-scaled exact-integer folds).  Returns 0 (no seasonality) when
    nothing scores above the 0.3 floor Kusto's docs describe as a
    'significant' period."""
    import numpy as np

    v = np.where(np.isnan(x), 0.0, x)
    n = len(v)
    if n < 4:
        return 0
    # detrend first (subtract the OLS linefit): a monotone trend has
    # autocorrelation > the floor at EVERY small lag and would always
    # masquerade as a period-2 seasonality
    idx = np.arange(n, dtype=float)
    mi, mv = _seq_mean(idx), _seq_mean(v)
    var = _seq_mean((idx - mi) ** 2)
    slope = _seq_mean((idx - mi) * (v - mv)) / var if var else 0.0
    v = v - (mv - slope * mi + slope * idx)
    s = 0.0
    for e in v:
        s += float(e)
    c = v * n - s
    den = 0.0
    for e in c:
        den += float(e) * float(e)
    if den <= 0:
        return 0
    best_lag, best = 0, 0.3
    for lag in range(2, n // 2 + 1):
        num = 0.0
        for i in range(n - lag):
            num += float(c[i]) * float(c[i + lag])
        score = num / den
        if score > best:
            best_lag, best = lag, score
    return best_lag


def _decomp_arrays(x, period: int, trend: str):
    """The series_decompose model on one array — IDENTICAL math to the
    row-level operator (per-phase median seasonal zero-centered by the
    row-mean of phase medians; 'avg' or 'linefit' trend on the
    deseasoned series; components rounded to 4 in the same order).
    ``period=-1`` auto-detects via ``_detect_period``; no significant
    period -> pure-trend decomposition (seasonal all zero)."""
    import numpy as np

    if period == -1:
        period = _detect_period(x)
    if period <= 0:
        # no seasonality: zero seasonal component, trend fits the raw
        # series
        period = max(len(x), 1)
        n = len(x)
        seasonal = np.zeros(n)
        des = x - seasonal
        idx = np.arange(n, dtype=float)
        m = ~np.isnan(des)
        if trend == "linefit" and m.sum() >= 2:
            mi, md = _seq_mean(idx[m]), _seq_mean(des[m])
            cov = _seq_mean((idx[m] - mi) * (des[m] - md))
            var = _seq_mean((idx[m] - mi) ** 2)
            slope = cov / var if var else 0.0
            tr = np.round(md - slope * mi + slope * idx, 4)
        elif trend == "none":
            tr = np.zeros(n)
        else:
            tr = np.round(np.full(n, _seq_mean(des)), 4)
        baseline = np.round(seasonal + tr, 4)
        residual = np.round(x - baseline, 4)
        return baseline, seasonal, tr, residual

    n = len(x)
    ph = np.arange(n) % period
    pm = np.full(n, np.nan)
    for p in range(period):
        vals = x[(ph == p) & ~np.isnan(x)]
        if len(vals):
            pm[ph == p] = np.median(vals)
    seasonal = np.round(pm - _seq_mean(pm), 4)
    des = x - seasonal
    idx = np.arange(n, dtype=float)
    m = ~np.isnan(des)
    if trend == "linefit" and m.sum() >= 2:
        mi, md = _seq_mean(idx[m]), _seq_mean(des[m])
        cov = _seq_mean((idx[m] - mi) * (des[m] - md))
        var = _seq_mean((idx[m] - mi) ** 2)
        slope = cov / var if var else 0.0
        tr = np.round(md - slope * mi + slope * idx, 4)
    elif trend == "avg" or m.sum() < 2:
        tr = np.round(np.full(n, _seq_mean(des)), 4)
    elif trend == "none":
        tr = np.zeros(n)
    else:
        raise ValueError(f"trend must be avg/linefit/none, got {trend!r}")
    baseline = np.round(seasonal + tr, 4)
    residual = np.round(x - baseline, 4)
    return baseline, seasonal, tr, residual


def _as_x(v):
    import numpy as np

    return np.array([np.nan if e is None else float(e) for e in v])


def _lst(a):
    import numpy as np

    return [None if np.isnan(e) else float(e) for e in a]


def _kernel_decompose(arrs, periods, trends) -> "pd.DataFrame":
    out = {"baseline": [], "seasonal": [], "trend": [], "residual": []}
    for v, p, t in zip(arrs, periods, trends):
        if v is None:
            for k in out:
                out[k].append(None)
            continue
        b, s, tr, r = _decomp_arrays(_as_x(v), int(p), str(t))
        out["baseline"].append(_lst(b))
        out["seasonal"].append(_lst(s))
        out["trend"].append(_lst(tr))
        out["residual"].append(_lst(r))
    return pd.DataFrame(out)


def _kernel_decompose_anomalies(arrs, periods, ks, trends) -> "pd.Series":
    import numpy as np

    res = []
    for v, p, k, t in zip(arrs, periods, ks, trends):
        if v is None:
            res.append(None)
            continue
        k = float(k)  # SQL decimal literal -> python float
        x = _as_x(v)
        _b, _s, _t, r = _decomp_arrays(x, int(p), str(t))
        rr = r[~np.isnan(r)]
        if len(rr) == 0:
            res.append([0] * len(x))
            continue
        q1, q3 = np.percentile(rr, 25), np.percentile(rr, 75)
        lo, hi = q1 - k * (q3 - q1), q3 + k * (q3 - q1)
        res.append(
            [
                0 if e != e else (1 if e > hi else (-1 if e < lo else 0))
                for e in r
            ]
        )
    return pd.Series(res)


def _kernel_decompose_forecast(arrs, periods, points, trends) -> "pd.Series":
    """Whole-series baseline + ``points`` extrapolated steps (Kusto's
    series_decompose_forecast shape: the model's fit over the observed
    range, then the forecast beyond it)."""
    import numpy as np

    res = []
    for v, p, h, t in zip(arrs, periods, points, trends):
        if v is None:
            res.append(None)
            continue
        p, h = int(p), int(h)
        x = _as_x(v)
        n = len(x)
        if p == -1:
            p = _detect_period(x)
        b, s, tr, _r = _decomp_arrays(x, p if p > 0 else 0, str(t))
        if p <= 0:
            p = 1  # no seasonality: the profile below is [0.0]
        # seasonal profile per phase (constant within a phase)
        prof = [None] * p
        for i in range(n):
            if prof[i % p] is None and s[i] == s[i]:
                prof[i % p] = float(s[i])
        fut_idx = np.arange(n, n + h, dtype=float)
        t = str(t)
        if t == "linefit" and n >= 2:
            # recover slope/intercept from two trend points
            slope = (tr[-1] - tr[0]) / (n - 1) if n > 1 else 0.0
            ftr = tr[-1] + slope * (fut_idx - (n - 1))
        else:
            ftr = np.full(h, tr[-1] if n else 0.0)
        fb = [
            None
            if prof[int(i) % p] is None
            else round(prof[int(i) % p] + float(ft), 4)
            for i, ft in zip(fut_idx, ftr)
        ]
        res.append(_lst(b) + fb)
    return pd.Series(res)


#: kernel registry for SQL-function registration (functions/kql_parse.py)
SERIES_KERNELS = {
    "series_fill_forward": _kernel_fill_forward,
    "series_fill_backward": _kernel_fill_backward,
    "series_fill_linear": _kernel_fill_linear,
    "series_outliers": _kernel_outliers,
}


def series_fill_forward(arr: Column | str) -> Column:
    """Kusto ``series_fill_forward``: nulls take the last preceding
    non-null value; leading nulls stay null.

    Arrow-vectorized pandas UDF: Catalyst's pure array expressions
    cannot express an O(n) prefix scan (``aggregate`` + ``concat``
    re-copies the accumulator array per element — measured quadratic,
    ~3 s for ONE 1.5k-slot series), so this is the legitimate
    drop-to-numpy case.  Linear per row, exact semantics."""

    @F.pandas_udf("array<double>")
    def _u(col: pd.Series) -> pd.Series:
        return _kernel_fill_forward(col)

    return _u(F.col(arr) if isinstance(arr, str) else arr)


def series_fill_backward(arr: Column | str) -> Column:
    """Kusto ``series_fill_backward``: nulls take the next following
    non-null value; trailing nulls stay null.  Arrow-vectorized pandas
    UDF (mirror of ``series_fill_forward`` — same no-O(n)-scan-in-
    Catalyst rationale)."""

    @F.pandas_udf("array<double>")
    def _u(col: pd.Series) -> pd.Series:
        return _kernel_fill_backward(col)

    return _u(F.col(arr) if isinstance(arr, str) else arr)


def series_fill_const(arr: Column | str, value: float) -> Column:
    """Kusto ``series_fill_const``: nulls take a constant — pure JVM
    ``transform`` + ``coalesce``, no UDF."""
    a = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(
        a, lambda x: F.coalesce(x.cast("double"), F.lit(float(value)))
    )


def series_fill_linear(arr: Column | str) -> Column:
    """Kusto ``series_fill_linear``: interior nulls interpolate
    linearly between the nearest non-null neighbors; edge nulls take
    the nearest non-null value (Kusto's default edge behavior).

    Arrow-vectorized pandas UDF for the same reason as
    ``series_fill_forward`` (no O(n) scan in pure Catalyst arrays).
    The interpolation is grouped ``p + (n - p) * (di / dn)`` to match
    the ANSI-SQL oracle's expression bit-for-bit."""

    @F.pandas_udf("array<double>")
    def _u(col: pd.Series) -> pd.Series:
        return _kernel_fill_linear(col)

    return _u(F.col(arr) if isinstance(arr, str) else arr)


def series_outliers(arr: Column | str) -> Column:
    """Kusto ``series_outliers``-style anomaly score via Tukey fences:
    score[i] = (x[i] - median) / IQR (0 where IQR = 0 or x null), with
    quartiles by nearest-rank on the sorted non-null values.
    |score| > 1.5 is the classic mild-outlier fence.

    Arrow-vectorized pandas UDF: the pure-expression form re-evaluates
    the sorted-array quartiles INSIDE the per-element lambda (Catalyst
    does not CSE across lambda boundaries — the codegen trap documented
    in operators/dedup.py), turning O(n log n) into O(n^2 log n); numpy
    computes the identical IEEE doubles once per row."""

    @F.pandas_udf("array<double>")
    def _u(col: pd.Series) -> pd.Series:
        return _kernel_outliers(col)

    return _u(F.col(arr) if isinstance(arr, str) else arr)


def series_stats(arr: Column | str) -> Column:
    """min/max/sum/avg of a series array as a struct — all array
    expressions, computed without exploding."""
    a = F.col(arr) if isinstance(arr, str) else arr
    total = F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double"))
    return F.struct(
        F.array_min(a).alias("min"),
        F.array_max(a).alias("max"),
        total.alias("sum"),
        (total / F.size(a)).alias("avg"),
    )


def series_decompose(
    df: DataFrame,
    key_cols: list[str],
    idx_col: str,
    val_col: str,
    period: int,
    trend: str = "linefit",
) -> DataFrame:
    """Seasonal/trend decomposition over REGULAR series rows (the
    exploded twin of a make-series array) — Kusto's series_decompose
    surface in a precisely documented profile:

    - ``seasonal``: per-phase (idx mod period) MEDIAN of the value,
      zero-centered by the key's row-mean of those medians (a robust
      periodic profile; median resists outlier contamination);
    - ``trend``: OLS linefit of the deseasoned series over the index
      (``trend='linefit'``) or its constant mean (``'avg'`` — Kusto's
      default argument), via regr_slope/regr_intercept/avg;
    - ``baseline = seasonal + trend``; ``residual = value - baseline``.

    Everything is JVM window aggregates over (key, phase) and (key) —
    one shuffle by key; no Python, no collect.  Each component is
    rounded to 4 places IN ORDER (seasonal, then trend over the
    rounded-deseasoned series, then baseline/residual) so a SQL oracle
    can reproduce the exact doubles.
    """
    if trend not in ("linefit", "avg"):
        raise ValueError(f"trend must be 'linefit' or 'avg', got {trend!r}")
    w_key = Window.partitionBy(*key_cols)
    w_phase = Window.partitionBy(
        *key_cols, F.pmod(F.col(idx_col), F.lit(period))
    )
    out = df.withColumn(
        "_phase_med", F.expr(f"median({val_col})").over(w_phase)
    )
    out = out.withColumn(
        "seasonal",
        F.round(F.col("_phase_med") - F.avg("_phase_med").over(w_key), 4),
    )
    out = out.withColumn("_des", F.col(val_col) - F.col("seasonal"))
    if trend == "linefit":
        out = out.withColumn(
            "trend",
            F.round(
                F.expr(f"regr_intercept(_des, {idx_col})").over(w_key)
                + F.expr(f"regr_slope(_des, {idx_col})").over(w_key)
                * F.col(idx_col),
                4,
            ),
        )
    else:
        out = out.withColumn("trend", F.round(F.avg("_des").over(w_key), 4))
    out = out.withColumn(
        "baseline", F.round(F.col("seasonal") + F.col("trend"), 4)
    )
    out = out.withColumn(
        "residual", F.round(F.col(val_col) - F.col("baseline"), 4)
    )
    return out.drop("_phase_med", "_des")


def series_decompose_forecast(
    df: DataFrame,
    key_cols: list[str],
    idx_col: str,
    val_col: str,
    period: int,
    horizon: int,
    trend: str = "avg",
) -> DataFrame:
    """Kusto ``series_decompose_forecast`` profile: fit the
    ``series_decompose`` model (per-phase median seasonal profile +
    constant-mean or OLS-linefit trend) on the observed rows, then
    extrapolate ``horizon`` future index steps per key —
    ``forecast = seasonal(idx mod period) + trend(idx)``.

    All JVM aggregates: one groupBy for the phase profile, one for the
    fit (slope/intercept/max-idx), a ``sequence`` explode for the
    future index axis, and a (key, phase) equi-join — cost is
    O(keys × period + keys × horizon), never touching the data again.
    Output = ``key..., idx, forecast`` for the future points only."""
    if horizon <= 0:
        raise ValueError(f"horizon must be positive, got {horizon}")
    dec = series_decompose(df, key_cols, idx_col, val_col, period, trend)
    prof = dec.groupBy(
        *key_cols, F.pmod(F.col(idx_col), F.lit(period)).alias("_ph")
    ).agg(F.min("seasonal").alias("_seasonal"))
    if trend == "avg":
        fit = dec.groupBy(*key_cols).agg(
            F.max(idx_col).alias("_mx"), F.min("trend").alias("_trend")
        )
        fut = fit.select(
            *key_cols,
            "_trend",
            F.explode(
                F.sequence(F.col("_mx") + 1, F.col("_mx") + horizon)
            ).alias(idx_col),
        )
        trend_col = F.col("_trend")
    else:
        fit = (
            dec.withColumn("_des", F.col(val_col) - F.col("seasonal"))
            .groupBy(*key_cols)
            .agg(
                F.expr(f"regr_slope(_des, {idx_col})").alias("_m"),
                F.expr(f"regr_intercept(_des, {idx_col})").alias("_b"),
                F.max(idx_col).alias("_mx"),
            )
        )
        fut = fit.select(
            *key_cols,
            "_m",
            "_b",
            F.explode(
                F.sequence(F.col("_mx") + 1, F.col("_mx") + horizon)
            ).alias(idx_col),
        )
        trend_col = F.round(
            F.col("_b") + F.col("_m") * F.col(idx_col), 4
        )
    out = fut.join(
        prof,
        [fut[c] == prof[c] for c in key_cols]
        + [F.pmod(fut[idx_col], F.lit(period)) == prof["_ph"]],
    )
    return out.select(
        *[fut[c] for c in key_cols],
        fut[idx_col],
        F.round(F.col("_seasonal") + trend_col, 4).alias("forecast"),
    )


def series_anomalies(
    df: DataFrame,
    key_cols: list[str],
    idx_col: str,
    val_col: str,
    period: int,
    k: float = 1.5,
    trend: str = "linefit",
) -> DataFrame:
    """Kusto series_decompose_anomalies profile: decompose, then flag
    residuals outside the per-key Tukey fences (exact interpolated
    quartiles of the residual; ``k``=1.5 is the same fence
    series_outliers uses).  Adds ``ad_flag`` (+1 high / -1 low / 0)
    and ``ad_score`` (residual distance beyond the fence, 0 inside,
    rounded to 4).  Window aggregates only — one shuffle by key."""
    dec = series_decompose(df, key_cols, idx_col, val_col, period, trend)
    w_key = Window.partitionBy(*key_cols)
    q1 = F.expr("percentile(residual, 0.25)").over(w_key)
    q3 = F.expr("percentile(residual, 0.75)").over(w_key)
    lo = q1 - k * (q3 - q1)
    hi = q3 + k * (q3 - q1)
    r = F.col("residual")
    return (
        dec.withColumn(
            "ad_flag",
            F.when(r > hi, F.lit(1)).when(r < lo, F.lit(-1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "ad_score",
            F.round(
                F.when(r > hi, r - hi).when(r < lo, lo - r).otherwise(F.lit(0.0)),
                4,
            ),
        )
    )


def series_fir(
    arr: Column | str,
    coefs: list[float],
    normalize: bool = False,
    center: bool = False,
) -> Column:
    """Finite-impulse-response filter over a series array (Kusto
    ``series_fir`` surface): ``out[i] = sum_j coefs[j] * x[i - j]``
    (``coefs[0]`` applies to the current sample), zero-padded at the
    boundary; ``center=True`` shifts the window so it is centered on
    the sample; ``normalize=True`` divides the coefficients by their
    sum (Kusto's default when all coefficients are positive).

    Pure JVM higher-order expression (transform + aggregate + get):
    no shuffle, no Python, O(n_points * n_coefs) per row."""
    a = F.col(arr) if isinstance(arr, str) else arr
    cs = [float(c) for c in coefs]
    if normalize:
        t = sum(cs)
        if t == 0:
            raise ValueError("cannot normalize zero-sum coefficients")
        cs = [c / t for c in cs]
    shift = (len(cs) - 1) // 2 if center else 0
    coef_arr = F.array(*[F.lit(c) for c in cs])
    n_f = len(cs)

    def one(v, i):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(n_f - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(coef_arr, (j + 1).cast("int"))
            * F.coalesce(
                F.get(a, (i - j + shift).cast("int")).cast("double"),
                F.lit(0.0),
            ),
        )

    return F.transform(a, one)


def series_pearson_correlation(
    a: Column | str, b: Column | str
) -> Column:
    """Pearson correlation of two equal-length series arrays (Kusto
    ``series_pearson_correlation``): computed from the five running
    sums as one JVM expression — no explode, no shuffle.  NULL when
    either series has zero variance."""
    x = F.col(a) if isinstance(a, str) else a
    y = F.col(b) if isinstance(b, str) else b
    n = F.size(x).cast("double")

    def s(col):
        return F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v.cast("double"))

    sx, sy = s(x), s(y)
    sxx = F.aggregate(x, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    syy = F.aggregate(y, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    sxy = F.aggregate(
        F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return F.when(den > 0, (n * sxy - sx * sy) / den)
