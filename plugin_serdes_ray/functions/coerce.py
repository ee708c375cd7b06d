"""String -> typed coercion, reproducing the reference's scalar semantics
(/root/reference avro/AvroConverter.java): trueValues/falseValues lists
(:46-49, case-insensitive :590-592), nullValues incl. "", "NA", "nan"
(:52-66), decimalSeparator replacement (:286-292), date/time/datetime
patterns with timezone fallback (:70-90), epoch-millis/micros numeric fast
path (:379-383,429-433), HALF_EVEN decimal rounding (:294-319).

Vectorized: operates on whole Arrow arrays via pyarrow.compute / pandas.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from decimal import ROUND_HALF_EVEN, Decimal
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .errors import BadLineError, OnBadLines, handle_bad, truncate

# reference defaults (AvroConverter.java:46-66)
TRUE_VALUES = ["t", "true", "yes", "1", "on"]
FALSE_VALUES = ["f", "false", "no", "0", "off"]
NULL_VALUES = [
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "n/a", "nan",
    "null", "None",
]
# reference default patterns (AvroConverter.java:70-78, java patterns -> strptime)
DATE_FORMAT = "%Y-%m-%d"
TIME_FORMAT = "%H:%M"
DATETIME_FORMAT = "iso"


@dataclass
class CoerceOptions:
    true_values: list[str] = field(default_factory=lambda: list(TRUE_VALUES))
    false_values: list[str] = field(default_factory=lambda: list(FALSE_VALUES))
    null_values: list[str] = field(default_factory=lambda: list(NULL_VALUES))
    decimal_separator: str = "."
    date_format: str = DATE_FORMAT
    time_format: str = TIME_FORMAT
    datetime_format: str = DATETIME_FORMAT
    timezone: str = "UTC"   # fallback zone for zoneless datetimes (:90,615-617)
    on_bad_lines: OnBadLines = OnBadLines.ERROR
    strict_schema: bool = False


def _as_str_array(arr: pa.Array) -> pa.Array:
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    return arr.cast(pa.string())


def nullify(arr: pa.Array, opts: CoerceOptions) -> pa.Array:
    """Map configured null sentinels (incl. "") to null (typed path only —
    the container engine deliberately does NOT do this, SURVEY.md §7.3)."""
    s = _as_str_array(arr)
    mask = pc.is_in(s, value_set=pa.array(opts.null_values, type=s.type))
    return pc.if_else(mask, pa.nulls(len(s), s.type), s)


def _fail_mask(orig: pa.Array, converted: pa.Array, opts: CoerceOptions,
               what: str) -> pa.Array:
    """Nulls introduced by conversion = failures; apply the bad-lines policy."""
    bad = pc.and_(pc.is_valid(orig), pc.is_null(converted))
    n_bad = pc.sum(pc.cast(bad, pa.int64())).as_py() or 0
    if n_bad:
        idx = pc.index(bad, True).as_py()
        sample = orig[idx].as_py() if idx >= 0 else "?"
        handle_bad(opts.on_bad_lines,
                   f"{n_bad} value(s) not convertible to {what}; "
                   f"first offender: {truncate(str(sample))!r}")
    return converted


def to_boolean(arr: pa.Array, opts: Optional[CoerceOptions] = None) -> pa.Array:
    opts = opts or CoerceOptions()
    if pa.types.is_boolean(arr.type):
        return arr
    s = pc.utf8_lower(pc.utf8_trim_whitespace(nullify(arr, opts)))
    tv = pa.array([v.lower() for v in opts.true_values], type=s.type)
    fv = pa.array([v.lower() for v in opts.false_values], type=s.type)
    is_t = pc.is_in(s, value_set=tv)
    is_f = pc.is_in(s, value_set=fv)
    out = pc.if_else(is_t, pa.scalar(True),
                     pc.if_else(is_f, pa.scalar(False), pa.nulls(len(s), pa.bool_())))
    return _fail_mask(s, out, opts, "boolean")


def _replace_decimal_sep(s: pa.Array, opts: CoerceOptions) -> pa.Array:
    if opts.decimal_separator != ".":
        s = pc.replace_substring(s, pattern=opts.decimal_separator, replacement=".")
    return s


_I64_MAX = (1 << 63) - 1


def _nullable_to_int64(pd_s: pd.Series) -> pa.Array:
    """Exact numpy_nullable numeric series -> int64 Arrow array. Fractional
    values and values outside int64 (UInt64 spill above 2^63-1, float
    overflow) become null — the caller's _fail_mask policy-routes them —
    instead of ArrowInvalid aborting the batch before the policy applies."""
    pd_s = pd_s.where(pd_s % 1 == 0)
    if pd_s.dtype.kind == "u":
        # to_numeric went UInt64: >= one value above int64 max. Mask those
        # via exact integer comparison (a float roundtrip would corrupt
        # legal values in (2^53, 2^63))
        na = pd_s.isna().to_numpy()
        vals = pd_s.fillna(0).to_numpy(dtype="uint64")
        masked = pd.array(vals.astype(np.int64), dtype="Int64")
        masked[na | (vals > np.uint64(np.iinfo(np.int64).max))] = pd.NA
        pd_s = pd.Series(masked, index=pd_s.index)
    elif pd_s.dtype.kind == "f":
        # floats beyond int64's range (exact power-of-two bounds) fail
        pd_s = pd_s.where((pd_s >= -(2.0 ** 63)) & (pd_s < 2.0 ** 63))
    return pa.array(pd.array(pd_s, dtype="Int64"), type=pa.int64())


def _floor_div_i64(a: pa.Array, divisor: int) -> pa.Array:
    """Integer division flooring toward -inf. pc.divide truncates toward
    zero, which would round pre-epoch sub-unit timestamps UP toward the
    epoch instead of down to the previous whole unit."""
    d = pa.scalar(divisor, pa.int64())
    q = pc.divide(a, d)
    r = pc.subtract(a, pc.multiply(q, d))
    adj = pc.and_(pc.less(a, 0), pc.not_equal(r, 0))
    return pc.subtract(q, pc.cast(adj, pa.int64()))


def _checked_scale_i64(a: pa.Array, factor: int) -> pa.Array:
    """a * factor with overflow -> null (policy-routed failure). Plain
    pc.multiply wraps silently, turning e.g. a year-2286 epoch-ms value
    into a valid-looking garbage ns timestamp. The symmetric bound gives
    up one representable value at the int64 min edge (conservative)."""
    bound = _I64_MAX // factor
    ok = pc.and_(pc.greater_equal(a, pa.scalar(-bound, pa.int64())),
                 pc.less_equal(a, pa.scalar(bound, pa.int64())))
    masked = pc.if_else(pc.fill_null(ok, False), a,
                        pa.nulls(len(a), pa.int64()))
    return pc.multiply(masked, pa.scalar(factor, pa.int64()))


def to_int(arr: pa.Array, typ: pa.DataType = None,
           opts: Optional[CoerceOptions] = None) -> pa.Array:
    opts = opts or CoerceOptions()
    typ = typ or pa.int64()
    if pa.types.is_integer(arr.type):
        try:
            return arr.cast(typ)
        except pa.ArrowInvalid:
            # narrowing overflow: policy-route like the string/float paths
            # instead of ArrowInvalid aborting the batch. Compare in the
            # SOURCE type against the intersection of both ranges.
            def _bounds(t):
                if pa.types.is_signed_integer(t):
                    return -(1 << (t.bit_width - 1)), \
                        (1 << (t.bit_width - 1)) - 1
                return 0, (1 << t.bit_width) - 1
            slo, shi = _bounds(arr.type)
            tlo, thi = _bounds(typ)
            lo, hi = max(slo, tlo), min(shi, thi)
            ok = pc.and_(pc.greater_equal(arr, pa.scalar(lo, arr.type)),
                         pc.less_equal(arr, pa.scalar(hi, arr.type)))
            out = pc.if_else(pc.fill_null(ok, False), arr,
                             pa.nulls(len(arr), arr.type)).cast(typ)
            return _fail_mask(arr, out, opts, str(typ))
    if pa.types.is_floating(arr.type):
        # mirror the string path: fractional values (NaN, +-inf) and values
        # outside the target type's range are coercion failures routed
        # through the on_bad_lines policy — NOT a pa.ArrowInvalid aborting
        # the pipeline before the policy applies (ADVICE r2). Range bounds
        # are exact powers of two (representable in float), half-open so
        # e.g. 2^63 itself fails for int64.
        whole = pc.equal(arr, pc.floor(arr))
        bits = typ.bit_width
        if pa.types.is_signed_integer(typ):
            lo, hi = -(2.0 ** (bits - 1)), 2.0 ** (bits - 1)
        else:
            lo, hi = 0.0, 2.0 ** bits
        in_range = pc.and_(pc.greater_equal(arr, lo), pc.less(arr, hi))
        ok = pc.and_(pc.fill_null(whole, False), pc.fill_null(in_range, False))
        out = pc.if_else(ok, arr, pa.nulls(len(arr), arr.type)).cast(typ)
        return _fail_mask(arr, out, opts, str(typ))
    s = pc.utf8_trim_whitespace(nullify(arr, opts))
    s = _replace_decimal_sep(s, opts)
    # nullable backend: the default float64 coercion would silently corrupt
    # integers above 2^53 whenever the batch contains ANY null (int64 can't
    # hold NaN) — found by the string-identity property test
    # integer coercion rejects fractional values (PrimitiveIntTest analog);
    # out-of-range values are policy-routed failures like the float path
    # above, never a TypeError/ArrowInvalid aborting the batch before the
    # policy applies
    i64 = _nullable_to_int64(pd.to_numeric(s.to_pandas(), errors="coerce",
                                           dtype_backend="numpy_nullable"))
    if typ != pa.int64():
        bits = typ.bit_width
        if pa.types.is_signed_integer(typ):
            lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        else:
            lo, hi = 0, (1 << bits) - 1
        ok = pc.and_(pc.greater_equal(i64, lo), pc.less_equal(i64, hi))
        i64 = pc.if_else(pc.fill_null(ok, False), i64,
                         pa.nulls(len(i64), pa.int64()))
    out = i64.cast(typ)
    return _fail_mask(s, out, opts, str(typ))


def to_float(arr: pa.Array, typ: pa.DataType = None,
             opts: Optional[CoerceOptions] = None) -> pa.Array:
    opts = opts or CoerceOptions()
    typ = typ or pa.float64()
    if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type):
        return arr.cast(typ)
    s = _replace_decimal_sep(pc.utf8_trim_whitespace(nullify(arr, opts)), opts)
    pd_s = pd.to_numeric(s.to_pandas(), errors="coerce")
    out = pa.array(pd_s, type=typ)
    return _fail_mask(s, out, opts, str(typ))


def to_decimal(arr: pa.Array, precision: int, scale: int,
               opts: Optional[CoerceOptions] = None) -> pa.Array:
    """Decimal with HALF_EVEN rounding (AvroConverter.java:294-319)."""
    opts = opts or CoerceOptions()
    typ = pa.decimal128(precision, scale)
    s = _replace_decimal_sep(_as_str_array(nullify(_as_str_array(arr), opts)), opts)
    quant = Decimal(1).scaleb(-scale)

    def conv(v):
        if v is None:
            return None
        try:
            d = Decimal(str(v)).quantize(quant, rounding=ROUND_HALF_EVEN)
        except Exception:
            return None
        # a coefficient wider than the declared precision is a coercion
        # failure for the policy, not an ArrowInvalid aborting the batch
        if len(d.as_tuple().digits) > precision:
            return None
        return d

    out = pa.array([conv(v) for v in s.to_pylist()], type=typ)
    return _fail_mask(s, out, opts, f"decimal({precision},{scale})")


def to_date(arr: pa.Array, opts: Optional[CoerceOptions] = None) -> pa.Array:
    opts = opts or CoerceOptions()
    if pa.types.is_date(arr.type):
        return arr.cast(pa.date32())
    s = pc.utf8_trim_whitespace(nullify(arr, opts))
    pd_s = pd.to_datetime(s.to_pandas(), format=opts.date_format, errors="coerce")
    out = pa.array(pd_s.dt.date, type=pa.date32())
    return _fail_mask(s, out, opts, "date")


def to_time(arr: pa.Array, unit: str = "ms",
            opts: Optional[CoerceOptions] = None) -> pa.Array:
    opts = opts or CoerceOptions()
    typ = pa.time32(unit) if unit in ("s", "ms") else pa.time64(unit)
    if pa.types.is_time(arr.type):
        return arr.cast(typ)
    s = pc.utf8_trim_whitespace(nullify(arr, opts))
    pd_s = pd.to_datetime(s.to_pandas(), format=opts.time_format, errors="coerce")
    # format has no date part -> keep time-of-day only
    ns = (pd_s - pd_s.dt.normalize()).dt.total_seconds()
    scale = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit]
    vals = (ns * scale).round()
    i = pa.array(pd.array(vals, dtype="Int64"), type=pa.int64())
    if pa.types.is_time32(typ):
        # Arrow has no int64 -> time32 cast: route through int32 (values
        # fit: < 86400*1000 for ms)
        i = i.cast(pa.int32())
    out = i.cast(typ)
    return _fail_mask(s, out, opts, f"time[{unit}]")


def to_timestamp(arr: pa.Array, unit: str = "ms", tz: Optional[str] = None,
                 opts: Optional[CoerceOptions] = None) -> pa.Array:
    """Timestamp coercion with the epoch-numeric fast path
    (AvroConverter.java:379-383: all-digit strings parse as epoch millis)."""
    opts = opts or CoerceOptions()
    typ = pa.timestamp(unit, tz=tz)
    if pa.types.is_timestamp(arr.type):
        return arr.cast(typ)
    per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]

    def ms_to_unit(ms: pa.Array) -> pa.Array:
        # EXACT integer arithmetic in both directions: scaling up masks
        # would-overflow values to policy failures instead of wrapping
        # into garbage timestamps; scaling down floors (pre-epoch values
        # go to the previous whole unit, not up toward the epoch)
        if per_sec == 10**3:
            return ms
        if per_sec > 10**3:
            return _checked_scale_i64(ms, per_sec // 10**3)
        return _floor_div_i64(ms, 10**3)

    if pa.types.is_integer(arr.type):
        # integers are epoch MILLIS, same semantics as the all-digit string
        # fast path below (AvroConverter.java:379-383) — a bare cast to
        # timestamp(unit) would reinterpret them as counts of the TARGET
        # unit, silently shifting every value for unit != "ms"
        out = ms_to_unit(arr.cast(pa.int64())).cast(pa.timestamp(unit)).cast(typ)
        return _fail_mask(arr, out, opts, f"timestamp[{unit}]")
    s = pc.utf8_trim_whitespace(nullify(arr, opts))
    pd_str = s.to_pandas()
    numeric = pd_str.str.fullmatch(r"-?\d+", na=False)
    fmt = None if opts.datetime_format in ("iso", None) else opts.datetime_format
    dt_str = pd_str.where(~numeric)
    # offset-bearing and zoneless strings parse SEPARATELY: feeding a
    # mixed batch to one pd.to_datetime(utc=False) call coerces whichever
    # kind upsets the unified dtype to NaT, so a legal zoneless value
    # would fail purely because of its batch-mates. Zoneless values
    # localize to the fallback zone (AvroConverter :90,615-617).
    has_off = dt_str.str.contains(r"(?:Z|[+-]\d{2}:?\d{2})\s*$",
                                  na=False, regex=True)
    aware = pd.to_datetime(dt_str.where(has_off), format=fmt,
                           errors="coerce", utc=True)
    naive = pd.to_datetime(dt_str.where(~has_off), format=fmt,
                           errors="coerce", utc=False)
    if naive.dt.tz is None:
        naive = naive.dt.tz_localize(opts.timezone)
    parsed = aware.fillna(naive.dt.tz_convert("UTC"))
    parsed_ns = pa.array(parsed.dt.tz_localize(None),
                         type=pa.timestamp("ns")).cast(pa.int64())
    parsed_t = parsed_ns if per_sec == 10**9 else \
        _floor_div_i64(parsed_ns, 10**9 // per_sec)
    # epoch-millis strings via EXACT integer arithmetic: routing them
    # through pandas ns datetimes both crashed on values outside the
    # [1677, 2262] ns window (while the integer input path handled them)
    # and was the only float hop left in the fast path; _nullable_to_int64
    # masks all-digit strings beyond int64 to policy failures instead of
    # ArrowInvalid aborting the batch
    ms = _nullable_to_int64(
        pd.to_numeric(pd_str.where(numeric), errors="coerce",
                      dtype_backend="numpy_nullable"))
    num_t = ms_to_unit(ms)
    out = pc.coalesce(parsed_t, num_t).cast(pa.timestamp(unit)).cast(typ)
    return _fail_mask(s, out, opts, f"timestamp[{unit}]")


def to_string(arr: pa.Array, opts: Optional[CoerceOptions] = None) -> pa.Array:
    opts = opts or CoerceOptions()
    return nullify(_as_str_array(arr), opts)


def coerce_column(arr: pa.Array, typ: pa.DataType,
                  opts: Optional[CoerceOptions] = None) -> pa.Array:
    """Dispatch on target type (AvroConverter.java:219-284 analog)."""
    opts = opts or CoerceOptions()
    if pa.types.is_boolean(typ):
        return to_boolean(arr, opts)
    if pa.types.is_integer(typ):
        return to_int(arr, typ, opts)
    if pa.types.is_floating(typ):
        return to_float(arr, typ, opts)
    if pa.types.is_decimal(typ):
        return to_decimal(arr, typ.precision, typ.scale, opts)
    if pa.types.is_date(typ):
        return to_date(arr, opts)
    if pa.types.is_time(typ):
        unit = typ.unit
        return to_time(arr, unit, opts)
    if pa.types.is_timestamp(typ):
        return to_timestamp(arr, typ.unit, typ.tz, opts)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return to_string(arr, opts).cast(typ)
    return arr.cast(typ)


def coerce_table(table: pa.Table, schema: pa.Schema,
                 opts: Optional[CoerceOptions] = None) -> pa.Table:
    """Coerce all columns to a target schema; strict_schema rejects extra
    columns (AvroConverter.java:185-192)."""
    opts = opts or CoerceOptions()
    extra = set(table.column_names) - set(schema.names)
    if extra:
        if opts.strict_schema:
            raise BadLineError(
                truncate(f"strict schema: unexpected field(s) {sorted(extra)}"))
        table = table.drop_columns(sorted(extra))
    cols = {}
    for f in schema:
        if f.name in table.column_names:
            cols[f.name] = coerce_column(
                table.column(f.name).combine_chunks(), f.type, opts)
        else:
            cols[f.name] = pa.nulls(table.num_rows, f.type)  # missing -> null
    return pa.table(cols, schema=schema)
