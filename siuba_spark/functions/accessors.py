"""String / datetime accessor translations (``_.x.str.lower()``, ``_.ts.dt.year``).

Covers the SQL-base-dialect subset of the reference's ops registry
(reference: siuba/ops/generics.py:127-236, siuba/sql/dialects/base.py:266-360)
with pandas semantics shims (Monday=0 weekday) — implemented purely with
JVM-side ``pyspark.sql.functions`` so everything stays inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# .str accessor
# --------------------------------------------------------------------------


def _with_na(out, na):
    """pandas str predicates take na= to fill the NULL result."""
    if na is None:
        return out
    return F.coalesce(out, F.lit(bool(na)))


def _str_contains(col, pat, case=True, regex=True, na=None):
    if regex:
        if not case:
            out = F.upper(col).rlike(pat.upper()) if isinstance(pat, str)                 else col.rlike(pat)
        else:
            out = col.rlike(pat)
    elif not case:
        out = F.upper(col).contains(F.upper(F.lit(pat)))
    else:
        out = col.contains(pat)
    return _with_na(out, na)


def _str_slice(col, start=None, stop=None, step=None):
    if step not in (None, 1):
        from .lowering import TranslationError
        raise TranslationError(
            "str.slice(step=...) has no SQL/Spark substring equivalent "
            "(the reference's SQL dialects omit str.slice entirely, "
            "base.py); use a regexp instead")
    start = 0 if start is None else start
    if start < 0:
        # negative start counts from the end (pandas slice semantics);
        # Spark substring supports negative positions natively
        if stop is None:
            return F.substring(col, start, 2147483647)
        if stop >= 0:
            # mixed signs depend on each string's length: pandas
            # s[start:stop] = s[max(len+start, 0):stop] — substring with
            # per-row position/length columns (still codegen'd)
            eff = F.greatest(F.length(col) + start, F.lit(0))
            ln = F.greatest(F.lit(stop) - eff, F.lit(0))
            return F.substring(col, eff + 1, ln)
        if stop <= start:
            return F.lit("")
        return F.substring(col, start, stop - start)
    length = (stop - start) if stop is not None else 2147483647
    return F.substring(col, start + 1, length)


def _str_translate(col, table):
    """pandas str.translate takes a ``str.maketrans``-style dict mapping
    ordinals (or 1-char strings) to replacement chars or None (delete).
    Spark's ``F.translate(col, matching, replace)`` deletes any matching
    char beyond len(replace), so replacements are emitted first and
    deletions last (reference pandas op: siuba/ops/generics.py:165)."""
    repl_src, repl_dst, delete = [], [], []
    for k, v in table.items():
        src = chr(k) if isinstance(k, int) else str(k)
        if v is None:
            delete.append(src)
        else:
            repl_src.append(src)
            repl_dst.append(chr(v) if isinstance(v, int) else str(v))
    return F.translate(col, "".join(repl_src) + "".join(delete), "".join(repl_dst))


def _str_findall(col, pat):
    """pandas findall = re.findall: with no capture groups each element is
    the whole match; with exactly one group it is that group's content
    (reference pandas op, siuba/ops/generics.py:140).  Multi-group patterns
    would need arrays of tuples — not expressible as a flat Spark array."""
    import re as _re
    n_groups = _re.compile(pat).groups
    if n_groups > 1:
        raise NotImplementedError(
            "str.findall with >1 capture group returns tuples in pandas; "
            "use str.extract per group instead")
    return F.regexp_extract_all(col, F.lit(pat), min(n_groups, 1))


def _str_normalize(col, form):
    """pandas Series.str.normalize(form): unicodedata.normalize per
    element.  No Spark builtin exists; Arrow-batched pandas UDF (pure
    map, no shuffle) — the same sanctioned escape hatch
    corpus.text.normalize_text uses for its ``form=`` step."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be NFC/NFD/NFKC/NFKD, got {form!r}")

    def _batch(s):
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize(form, x))
    return F.pandas_udf(_batch, "string")(col)


STR_METHODS = {
    "lower": lambda col: F.lower(col),
    "upper": lambda col: F.upper(col),
    "len": lambda col: F.length(col),
    "normalize": _str_normalize,
    "strip": lambda col: F.trim(col),
    "lstrip": lambda col: F.ltrim(col),
    "rstrip": lambda col: F.rtrim(col),
    "title": lambda col: F.initcap(col),
    # pandas capitalize: first char upper, rest lower
    "capitalize": lambda col: F.concat(
        F.upper(F.substring(col, 1, 1)), F.lower(F.substring(col, 2, 2147483647))
    ),
    "startswith": lambda col, pat, na=None: _with_na(col.startswith(pat), na),
    "endswith": lambda col, pat, na=None: _with_na(col.endswith(pat), na),
    "contains": _str_contains,
    # match/fullmatch: beyond the reference (its SQL dialects comment
    # these out, base.py:290) — trivial Spark rlike translations with
    # pandas anchor semantics: match anchors at the START only,
    # fullmatch at both ends
    "match": lambda col, pat, case=True, na=None: _with_na(
        col.rlike("^(?:" + pat + ")") if case
        else col.rlike("(?i)^(?:" + pat + ")"), na),
    "fullmatch": lambda col, pat, case=True, na=None: _with_na(
        col.rlike("^(?:" + pat + ")$") if case
        else col.rlike("(?i)^(?:" + pat + ")$"), na),

    "replace": lambda col, pat, repl, regex=True: (
        F.regexp_replace(col, pat, repl) if regex
        else F.replace(col, F.lit(pat), F.lit(repl))
    ),
    "slice": _str_slice,
    "get": lambda col, i: F.substring(col, i + 1, 1),
    "split": lambda col, pat=None, regex=True: F.split(col, pat if pat is not None else r"\s+"),
    # pandas str.join concatenates the elements of a list-valued Series
    # (typically the output of str.split); a NULL row stays NULL, and a
    # list CONTAINING a NULL element yields NULL — pandas returns NaN for
    # such rows, whereas bare array_join would silently skip the element
    # (ADVICE r9 divergence, now matched)
    "join": lambda col, sep: F.when(
        F.exists(col, lambda x: x.isNull()), F.lit(None).cast("string")
    ).otherwise(F.array_join(col, sep)),
    "cat": lambda col, other, sep="": F.concat_ws(sep, col, other),
    "zfill": lambda col, width: F.lpad(col, width, "0"),
    "pad": lambda col, width, side="left", fillchar=" ": (
        F.lpad(col, width, fillchar) if side == "left" else F.rpad(col, width, fillchar)
    ),
    "islower": lambda col: (col == F.lower(col)) & F.length(col).cast("boolean"),
    "isupper": lambda col: (col == F.upper(col)) & F.length(col).cast("boolean"),
    "isdigit": lambda col: col.rlike(r"^[0-9]+$"),
    "isalpha": lambda col: col.rlike(r"^[A-Za-z]+$"),
    "isspace": lambda col: col.rlike(r"^\s+$"),
    "extract": lambda col, pat, idx=1: F.regexp_extract(col, pat, idx),
    "findall": lambda col, pat: _str_findall(col, pat),
    "count": lambda col, pat: F.size(F.split(col, pat)) - 1,
    "find": lambda col, sub: F.instr(col, sub) - 1,
    "repeat": lambda col, n: F.repeat(col, n),
    "translate": _str_translate,
    # swapcase has no Spark builtin: per-char, upper if it equals its
    # lower form, else lower (pure codegen via transform over the chars)
    "swapcase": lambda col: F.array_join(
        F.transform(
            F.split(col, ""),
            lambda ch: F.when(ch == F.lower(ch), F.upper(ch)).otherwise(F.lower(ch)),
        ), ""),
    "casefold": lambda col: F.lower(col),
    "isnumeric": lambda col: col.rlike(r"^[0-9]+$"),
    "isdecimal": lambda col: col.rlike(r"^[0-9]+$"),
    "isalnum": lambda col: col.rlike(r"^[A-Za-z0-9]+$"),
    "istitle": lambda col: (col == F.initcap(col)) & col.rlike(r"[A-Za-z]"),
    "removeprefix": lambda col, pre: F.when(
        col.startswith(pre), F.substring(col, len(pre) + 1, 2147483647)
    ).otherwise(col),
    "removesuffix": lambda col, suf: F.when(
        col.endswith(suf),
        F.substring(col, 1, F.length(col) - len(suf)),
    ).otherwise(col),
    "rfind": lambda col, sub: (
        F.when(F.instr(col, sub) == 0, F.lit(-1)).otherwise(
            F.length(col) - len(sub)
            - F.instr(F.reverse(col), sub[::-1]) + 1)
    ),
    # unlike Spark's pad builtins, pandas just/center never truncate
    "ljust": lambda col, width, fillchar=" ": F.when(
        F.length(col) >= width, col).otherwise(F.rpad(col, width, fillchar)),
    "rjust": lambda col, width, fillchar=" ": F.when(
        F.length(col) >= width, col).otherwise(F.lpad(col, width, fillchar)),
    "encode": lambda col, encoding="utf-8": F.encode(col, encoding),
    "decode": lambda col, encoding="utf-8": F.decode(col, encoding),
    # pandas slice_replace: splice repl between [start, stop)
    "slice_replace": lambda col, start=0, stop=None, repl="": F.concat(
        F.substring(col, 1, start),
        F.lit(repl),
        # stop=None replaces through the end: tail start stays INT-ranged
        # (2147483647 + 1 would overflow Spark's INT position parameter)
        F.substring(col, stop + 1 if stop is not None else 2147483647,
                    2147483647)),
    # pandas center: left pad gets floor of the slack, right gets the rest
    "center": lambda col, width, fillchar=" ": F.when(
        F.length(col) >= width, col).otherwise(
        F.rpad(
            F.lpad(col,
                   F.floor((F.lit(width) + F.length(col)) / 2).cast("int"),
                   fillchar),
            width, fillchar)),
}

# --------------------------------------------------------------------------
# .dt accessor
# --------------------------------------------------------------------------

# pandas strftime tokens → Spark datetime pattern (subset)
_STRFTIME_MAP = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%I", "hh"), ("%M", "mm"), ("%S", "ss"),
    ("%B", "MMMM"), ("%b", "MMM"), ("%A", "EEEE"), ("%a", "EEE"),
    ("%j", "DDD"), ("%p", "a"),
]


def strftime_to_spark(fmt: str) -> str:
    for py, spark in _STRFTIME_MAP:
        fmt = fmt.replace(py, spark)
    return fmt


def _monday0_dayofweek(col):
    # Spark F.dayofweek: Sunday=1..Saturday=7 → pandas Monday=0..Sunday=6
    # (reference remap: siuba/sql/dialects/base.py:99-103)
    return ((F.dayofweek(col) + 5) % 7).cast("int")


DT_PROPERTIES = {
    "year": lambda col: F.year(col),
    "month": lambda col: F.month(col),
    "day": lambda col: F.dayofmonth(col),
    "hour": lambda col: F.hour(col),
    "minute": lambda col: F.minute(col),
    "second": lambda col: F.second(col),
    "quarter": lambda col: F.quarter(col),
    "week": lambda col: F.weekofyear(col),
    "weekofyear": lambda col: F.weekofyear(col),
    "dayofyear": lambda col: F.dayofyear(col),
    "dayofweek": _monday0_dayofweek,
    "weekday": _monday0_dayofweek,
    "days_in_month": lambda col: F.dayofmonth(F.last_day(col)),
    "daysinmonth": lambda col: F.dayofmonth(F.last_day(col)),
    "date": lambda col: col.cast("date"),
    "is_month_start": lambda col: F.dayofmonth(col) == 1,
    "is_month_end": lambda col: col.cast("date") == F.last_day(col),
    "is_quarter_start": lambda col: col.cast("date") == F.date_trunc("quarter", col).cast("date"),
    "is_quarter_end": lambda col: col.cast("date") == F.last_day(F.add_months(F.date_trunc("quarter", col), 2)),
    "is_year_start": lambda col: (F.month(col) == 1) & (F.dayofmonth(col) == 1),
    "is_year_end": lambda col: (F.month(col) == 12) & (F.dayofmonth(col) == 31),
    "components": lambda col: _interval_components(col),
    "is_leap_year": lambda col: (F.year(col) % 4 == 0)
        & ((F.year(col) % 100 != 0) | (F.year(col) % 400 == 0)),
    # sub-second components of a timestamp (Spark precision is µs, so
    # pandas' nanosecond remainder is always 0)
    "microsecond": lambda col: (
        # unix_micros is exact where double epoch seconds would round at µs
        (F.unix_micros(col.cast("timestamp")) % 1000000 + 1000000) % 1000000
    ).cast("long"),
    "nanosecond": lambda col: F.lit(0).cast("int"),
    # timedelta field properties — pandas Timedelta normalization: days is
    # the signed floor, seconds/microseconds are non-negative remainders
    "days": lambda col: F.floor(_interval_total_seconds(col) / 86400).cast("long"),
    "seconds": lambda col: F.floor(
        _interval_total_seconds(col)
        - F.floor(_interval_total_seconds(col) / 86400) * 86400
    ).cast("long"),
    "microseconds": lambda col: F.round(
        (_interval_total_seconds(col) % 1 + 1) % 1 * 1000000
    ).cast("long"),
}

def epoch_seconds(col):
    """Seconds since epoch as double, tolerant of every timeline type.

    Spark 4 reads parquet timestamps without the UTC-adjustment flag as
    TIMESTAMP_NTZ, and ``ntz.cast("double")`` is a DATATYPE_MISMATCH error.
    Casting through TIMESTAMP first interprets the NTZ wall clock in the
    session timezone (exactly how DuckDB/pandas treat naive timestamps when
    the session runs UTC); for TIMESTAMP / DATE / numeric inputs the extra
    cast is a no-op that Catalyst folds away."""
    return col.cast("timestamp").cast("double")


def _wall_seconds(col):
    """Session-timezone wall-clock seconds since epoch.

    pandas dt.round/floor operate on the naive wall clock; Spark timestamps
    are instants rendered in the session timezone.  Shifting the instant by
    the session offset (from_utc_timestamp with the session zone) makes its
    UTC epoch value equal the wall-clock seconds, so fixed-frequency
    floor/round land on session-local midnights — the same semantics as
    ``date_trunc``, in every session timezone, not just UTC."""
    ts = col.cast("timestamp")
    return F.from_utc_timestamp(ts, F.current_timezone()).cast("double")


def _from_wall_seconds(secs):
    """Inverse of _wall_seconds: wall-clock epoch seconds → instant."""
    return F.to_utc_timestamp(F.timestamp_seconds(secs), F.current_timezone())


def _interval_total_seconds(col):
    """Total seconds of a day-time interval (pandas Timedelta.total_seconds,
    reference: siuba/ops/generics.py:222).  Spark can't cast an interval
    to double directly; epoch + interval → timestamp → double is exact and
    timezone-independent (timestamp_seconds(0) IS the epoch instant)."""
    return (F.timestamp_seconds(F.lit(0)) + col).cast("double")


def _interval_components(col):
    """pandas Timedelta.components as a struct (reference: generics.py:233).
    Sign convention matches pandas: all fields carry the interval's sign."""
    tot = _interval_total_seconds(col)
    # pandas normalizes so only `days` carries the sign:
    # Timedelta('-1h').components == (days=-1, hours=23, ...).  Floor
    # division of the SIGNED total reproduces that (floor(-3600/86400) = -1
    # day, remainder 82800s = 23h); the remainder is always non-negative.
    days = F.floor(tot / 86400)
    rem = tot - days * 86400
    hours = F.floor(rem / 3600)
    minutes = F.floor(rem % 3600 / 60)
    seconds = F.floor(rem % 60)
    millis = F.floor((rem % 1) * 1000)
    micros = F.floor((rem * 1000 % 1) * 1000)
    return F.struct(
        days.cast("long").alias("days"),
        hours.cast("long").alias("hours"),
        minutes.cast("long").alias("minutes"),
        seconds.cast("long").alias("seconds"),
        millis.cast("long").alias("milliseconds"),
        micros.cast("long").alias("microseconds"),
        F.lit(0).cast("long").alias("nanoseconds"),
    )


# fixed-width frequencies only — pandas dt.round/.floor with calendar
# units (M/Q/Y) raises there too
_FIXED_SECONDS = {
    "D": 86400, "d": 86400, "day": 86400,
    "H": 3600, "h": 3600, "hour": 3600,
    "T": 60, "min": 60, "minute": 60,
    "S": 1, "s": 1, "second": 1,
}


def _fixed_freq_seconds(freq):
    """Seconds in a fixed-width pandas freq string, supporting integer
    multiples ('15T', '30S', '6H').  None for calendar units."""
    import re as _re
    m = _re.fullmatch(r"(\d*)\s*([A-Za-z]+)", str(freq))
    if not m:
        return None
    mult = int(m.group(1)) if m.group(1) else 1
    secs = _FIXED_SECONDS.get(m.group(2))
    return mult * secs if secs else None


def _dt_round(col, freq):
    """Round to the nearest multiple of a fixed-width unit, half-to-even on
    the unit count — exactly pandas ``Series.dt.round`` (which uses banker's
    rounding on the number of units since epoch)."""
    secs = _fixed_freq_seconds(freq)
    if secs is None:
        raise NotImplementedError(
            f"dt.round only supports fixed frequencies (multiples of "
            f"{sorted(set(_FIXED_SECONDS))}), got {freq!r} "
            "(pandas raises for calendar units too)")
    cnt = F.bround(_wall_seconds(col) / secs)  # bround = half-to-even
    return _from_wall_seconds(cnt * secs)


def _dt_floor(col, freq):
    """Floor to a fixed multiple when the freq carries a multiplier
    ('15T', '6H' — epoch arithmetic); plain units keep date_trunc
    (session-timezone semantics, unchanged)."""
    import re as _re
    m = _re.fullmatch(r"(\d+)\s*([A-Za-z]+)", str(freq))
    if m and _FIXED_SECONDS.get(m.group(2)):
        secs = int(m.group(1)) * _FIXED_SECONDS[m.group(2)]
        return _from_wall_seconds(F.floor(_wall_seconds(col) / secs) * secs)
    return F.date_trunc(_FREQ_UNIT[freq], col)


DT_METHODS = {
    "strftime": lambda col, fmt: F.date_format(col, strftime_to_spark(fmt)),
    "month_name": lambda col: F.date_format(col, "MMMM"),
    "day_name": lambda col: F.date_format(col, "EEEE"),
    "normalize": lambda col: F.date_trunc("day", col),
    "floor": _dt_floor,
    "round": _dt_round,
    "total_seconds": _interval_total_seconds,
    # pandas tz_localize attaches a zone to a NAIVE timestamp; Spark
    # timestamps are instants rendered in the session zone, so the
    # equivalent is "interpret this wall clock in tz": to_utc_timestamp.
    # tz_convert (display-zone change) has no per-column representation —
    # it raises via registry absence, like the reference's sql_not_impl.
    "tz_localize": lambda col, tz: F.to_utc_timestamp(col, tz),
    # pandas Period string forms: 'M' → '2024-01', 'Q' → '2024Q1',
    # 'Y' → '2024', 'D' → '2024-01-15', 'W' raises (week periods render
    # as ranges, no scalar string form)
    "to_period": lambda col, freq="M": {
        "M": lambda c: F.date_format(c, "yyyy-MM"),
        "Y": lambda c: F.date_format(c, "yyyy"),
        "A": lambda c: F.date_format(c, "yyyy"),
        "D": lambda c: F.date_format(c, "yyyy-MM-dd"),
        "Q": lambda c: F.concat(F.date_format(c, "yyyy"), F.lit("Q"),
                                F.quarter(c).cast("string")),
    }[freq](col),
}

_FREQ_UNIT = {
    "D": "day", "H": "hour", "T": "minute", "min": "minute", "S": "second",
    "W": "week", "M": "month", "MS": "month", "Y": "year", "YS": "year",
    "Q": "quarter", "day": "day", "hour": "hour", "minute": "minute",
    "second": "second", "week": "week", "month": "month", "year": "year",
    "quarter": "quarter",
}
