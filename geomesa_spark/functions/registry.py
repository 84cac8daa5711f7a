"""Converter expression-function registry.

Rebuilds the reference's pluggable converter function library
(``geomesa-convert/geomesa-convert-common/.../Transformers.scala:27-305`` —
string ops, casts, dates, geometry construction, id/hash functions) as a
registry of named builders returning Spark Column expressions. Everything is
a built-in ``pyspark.sql.functions`` composition: JVM-side, codegen-friendly,
no per-row Python. New functions register via :func:`register` (the SPI
``ServiceRegistry`` analog, ``Transformers.scala:29-32``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

FUNCTIONS: dict[str, Callable[..., Column]] = {}


def _c(v) -> Column:
    """Coerce DSL literals (python str/int/float) to Columns where a
    function combines them with column args (string-spec calls pass
    literals through as raw values, mirroring Transformers' typed Exprs)."""
    return v if isinstance(v, Column) else F.lit(v)


def register(name: str):
    def deco(fn):
        FUNCTIONS[name] = fn
        return fn

    return deco


def resolve_function(name: str) -> Callable[..., Column]:
    try:
        return FUNCTIONS[name]
    except KeyError:
        raise KeyError(f"no converter function {name!r}; registered: {sorted(FUNCTIONS)}")


# --- string functions (Transformers.scala:224-238) -------------------------
register("stripQuotes")(lambda c: F.regexp_replace(c, "^['\"]|['\"]$", ""))
register("strlen")(lambda c: F.length(c))
register("trim")(lambda c: F.trim(c))
# reference StringUtils.capitalize: FIRST character only (initcap would
# title-case every word and lowercase the rest)
register("capitalize")(
    lambda c: F.concat(F.upper(F.substring(_c(c), 1, 1)), F.substring(_c(c), 2, 2147483647))
)
register("lowercase")(lambda c: F.lower(c))
register("uppercase")(lambda c: F.upper(c))
register("regexReplace")(lambda pattern, repl, c: F.regexp_replace(c, pattern, repl))
register("concat")(lambda *cs: F.concat(*[_c(c) for c in cs]))
register("strConcat")(lambda *cs: F.concat(*[_c(c) for c in cs]))  # GeoTools transform name
register("substr")(lambda c, a, b: F.substring(c, a + 1, b - a))
register("substring")(lambda c, a, b: F.substring(c, a + 1, b - a))

# --- casts (Transformers.scala:46-47,120-129) -------------------------------
# try_cast throughout: converter casts must yield NULL on malformed input
# (drop-bad-record semantics), not abort the job under Spark 4 ANSI mode
register("toInt")(lambda c: _c(c).try_cast("int"))
register("toLong")(lambda c: _c(c).try_cast("long"))
register("toDouble")(lambda c: _c(c).try_cast("double"))
register("toFloat")(lambda c: _c(c).try_cast("float"))
register("toBoolean")(lambda c: _c(c).try_cast("boolean"))

# --- dates (Transformers.scala:240-267) -------------------------------------
register("now")(lambda: F.current_timestamp())
# try_to_timestamp / try_cast: one malformed date must yield NULL, not
# abort the ingest under ANSI (same policy as the numeric casts above)
register("date")(lambda fmt, c: F.try_to_timestamp(_c(c), F.lit(fmt)))
register("isodate")(lambda c: F.try_to_timestamp(_c(c), F.lit("yyyyMMdd")))
register("isodatetime")(lambda c: F.try_to_timestamp(_c(c), F.lit("yyyyMMdd'T'HHmmss.SSSX")))
register("basicDateTimeNoMillis")(lambda c: F.try_to_timestamp(_c(c), F.lit("yyyyMMdd'T'HHmmssX")))
register("dateHourMinuteSecondMillis")(
    lambda c: F.try_to_timestamp(_c(c), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS"))
)
register("millisToDate")(lambda c: F.timestamp_millis(_c(c).try_cast("long")))
register("secsToDate")(lambda c: F.timestamp_seconds(_c(c).try_cast("long")))

# --- geometry (Transformers.scala:269-277) ----------------------------------
register("point")(
    lambda x, y: F.struct(_c(x).cast("double").alias("lon"), _c(y).cast("double").alias("lat"))
)
register("wktPoint")(
    lambda x, y: F.format_string("POINT (%s %s)", _c(x).cast("string"), _c(y).cast("string"))
)

# --- id / hash (Transformers.scala:279-294) ----------------------------------
register("string2bytes")(lambda c: F.encode(c, "UTF-8"))
register("md5")(lambda c: F.md5(c))
register("sha256")(lambda c: F.sha2(c, 256))
register("uuid")(lambda: F.expr("uuid()"))
register("base64")(lambda c: F.base64(c))
register("murmur3")(lambda c: F.xxhash64(c))  # 64-bit stable hash for ids/salts

# --- predicates (Transformers.scala:53-92 BinaryPredicate / and/or/not) ------
def _register_cmp(prefix: str, cast: str | None):
    def mk(op):
        def fn(a, b, _op=op):
            x, y = _c(a), _c(b)
            if cast:
                x, y = x.try_cast(cast), y.try_cast(cast)
            return {
                "Eq": x == y, "NEq": x != y, "LT": x < y, "GT": x > y,
                "LTEq": x <= y, "GTEq": x >= y,
            }[_op]

        return fn

    for op in ("Eq", "NEq", "LT", "GT", "LTEq", "GTEq"):
        register(f"{prefix}{op}")(mk(op))


_register_cmp("str", None)
_register_cmp("int", "int")
_register_cmp("long", "long")
_register_cmp("double", "double")

register("and")(lambda *cs: _reduce_bool(cs, True))
register("or")(lambda *cs: _reduce_bool(cs, False))
register("not")(lambda c: ~_c(c))


def _reduce_bool(cs, is_and: bool):
    out = _c(cs[0])
    for c in cs[1:]:
        out = (out & _c(c)) if is_and else (out | _c(c))
    return out


# --- lists / strings (Transformers list+string extras) -----------------------
# literal separator, not a regex: '|' or '.' as a raw F.split pattern
# would split every character (the batch converter quotes the same way)
register("toList")(lambda c, sep: F.split(_c(c), "\\Q" + sep + "\\E"))
register("listItem")(lambda c, i: _c(c).getItem(i))
register("listLen")(lambda c: F.size(_c(c)))
register("mkstring")(lambda c, sep: F.array_join(_c(c), sep))
register("emptyToNull")(lambda c: F.when(F.trim(_c(c)) == "", F.lit(None)).otherwise(_c(c)))
register("withDefault")(lambda c, d: F.coalesce(_c(c), _c(d)))
register("printf")(lambda fmt, *cs: F.format_string(fmt, *[_c(c) for c in cs]))


def _geohash_fn(lon, lat, chars):
    """GeoHash string of a point at the given character precision
    (Transformers.scala geohash function; vectorized numpy kernel)."""
    import pandas as pd

    from geomesa_spark.cells.geohash import geohash_encode

    def gh(lons, lats):
        out = geohash_encode(lons.to_numpy(), lats.to_numpy(), chars)
        return pd.Series(out)

    gh_udf = F.pandas_udf(gh, "string")
    return gh_udf(_c(lon).cast("double"), _c(lat).cast("double"))


register("geohash")(_geohash_fn)

# --- misc --------------------------------------------------------------------
register("lineNo")(lambda: F.monotonically_increasing_id())


def _avro_path(c, path):
    from geomesa_spark.sources.convert import avro_path

    return avro_path(_c(c), path)


register("avroPath")(_avro_path)
