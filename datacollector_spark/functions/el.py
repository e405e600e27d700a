"""StreamSets Expression Language (EL) -> Spark SQL translation.

The reference configures predicates and computed fields as EL strings —
``${record:value('/a/b') == 'x'}`` — evaluated per record
(container/.../el/ELEvaluatorImpl.java; function libraries RecordEL,
StringEL, MathEL, TimeEL in container/.../el/*EL.java). The engine's
native surface is Spark SQL via ``F.expr``; this shim translates the
common EL vocabulary so existing pipeline configs port without rewriting
every expression by hand.

Coverage (the functions the stock pipelines actually use):
  * ``record:value('/path')`` -> column reference (nested path -> dots)
  * ``record:attribute('name')`` -> envelope column (headers are columns
    here — SURVEY §1.2: Spark has no per-row side channel)
  * ``str:`` toUpper/toLower/trim/substring/replace/replaceAll/concat/
    length/contains/startsWith/endsWith/indexOf/regExCapture/truncate
  * ``math:`` abs/ceil/floor/max/min
  * ``time:`` now, millisecondsToDateTime, dateTimeToMilliseconds,
    extractStringFromDate
  * literals, arithmetic and comparison operators pass through
    (EL and SQL share them); ``&&``/``||``/``!`` -> AND/OR/NOT

Unknown ``ns:fn`` calls raise with the offending name — silently passing
them through would fail later inside Catalyst with a worse message.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# ns:fn -> SQL function name (1:1 argument passthrough)
_FN_MAP = {
    "str:toUpper": "upper",
    "str:toLower": "lower",
    "str:trim": "trim",
    "str:length": "length",
    "str:concat": "concat",
    "str:replace": "replace",
    "str:replaceAll": "regexp_replace",
    "str:contains": "contains",
    "str:startsWith": "startswith",
    "str:endsWith": "endswith",
    "math:abs": "abs",
    "math:ceil": "ceil",
    "math:floor": "floor",
    "math:max": "greatest",
    "math:min": "least",
    "time:millisecondsToDateTime": "timestamp_millis",
    "time:extractStringFromDate": "date_format",
}

_RECORD_VALUE = re.compile(r"record:value\(\s*'([^']*)'\s*\)")
_RECORD_ATTR = re.compile(r"record:attribute\(\s*'([^']*)'\s*\)")
_NS_FN = re.compile(r"\b([A-Za-z]+):([A-Za-z]+)\s*\(")


def _path_to_column(path: str) -> str:
    """'/Data/text' -> Data.text ; '/text' -> text ; "/a[2]/b" -> a[2].b"""
    parts = [p for p in path.split("/") if p]
    return ".".join(parts)


def el_to_sql(el: str) -> str:
    """Translate one EL string (with or without the ``${...}`` wrapper)
    into a Spark SQL expression string."""
    s = el.strip()
    if s.startswith("${") and s.endswith("}"):
        s = s[2:-1]

    s = _RECORD_VALUE.sub(lambda m: _path_to_column(m.group(1)), s)
    s = _RECORD_ATTR.sub(lambda m: _path_to_column(m.group(1)), s)

    # special forms whose arguments reorder or whose names need fixups
    s = re.sub(r"\bstr:substring\s*\(", "substr(", s)  # same (str, start, end)-ish
    s = re.sub(r"\bstr:truncate\s*\(", "left(", s)
    s = re.sub(r"\bstr:indexOf\s*\(", "instr(", s)
    s = re.sub(
        r"\bstr:regExCapture\s*\(", "regexp_extract(", s
    )  # (str, regex, group) — same order
    s = re.sub(r"\btime:now\s*\(\s*\)", "current_timestamp()", s)
    s = re.sub(
        r"\btime:dateTimeToMilliseconds\s*\(", "unix_millis(", s
    )

    def repl(m: re.Match) -> str:
        key = f"{m.group(1)}:{m.group(2)}"
        if key in _FN_MAP:
            return _FN_MAP[key] + "("
        raise ValueError(
            f"unsupported EL function {key!r} — add it to functions/el.py "
            "or rewrite the expression in Spark SQL"
        )

    s = _NS_FN.sub(repl, s)

    # boolean operators: EL uses Java syntax, SQL uses keywords. '!' only
    # when not '!=' (negation vs inequality).
    s = s.replace("&&", " AND ").replace("||", " OR ")
    s = re.sub(r"!(?!=)", " NOT ", s)
    return re.sub(r"\s+", " ", s).strip()


def el_expr(el: str) -> Column:
    """EL string -> Spark Column (the Expression Evaluator's field form)."""
    return F.expr(el_to_sql(el))


def el_condition(el: str) -> Column:
    """EL predicate -> boolean Column (preconditions / stream selector)."""
    return el_expr(el).cast("boolean")
