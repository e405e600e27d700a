"""StreamSets Expression Language (EL) -> Spark SQL translation.

The reference configures predicates and computed fields as EL strings —
``${record:value('/a/b') == 'x'}`` — evaluated per record
(container/.../el/ELEvaluatorImpl.java; function libraries RecordEL,
StringEL, TimeNowEL in common/.../lib/el/*EL.java). The engine's native
surface is Spark SQL via ``F.expr``; this shim translates the common EL
vocabulary so existing pipeline configs port without rewriting every
expression by hand.

Coverage:
  * ``record:`` value / attribute / attributeOrDefault / valueOrDefault /
    exists / type / id / creator / path / errorCode / errorMessage /
    errorStage / errorPipeline / errorCollectorId / errorTime /
    eventType / eventVersion / eventCreation / dValue / dValueAt /
    dIndex / dExists / dIsDupHeader / dHasDupHeaders / dToMap
  * ``str:`` toUpper/toLower/trim/substring/replace/replaceAll/concat/
    length/contains/startsWith/endsWith/indexOf/regExCapture/
    regexCapture/truncate/matches/urlEncode/urlDecode
  * ``math:`` abs/ceil/floor/max/min/round
  * ``time:`` now, trimDate, trimTime, millisecondsToDateTime,
    dateTimeToMilliseconds, extractStringFromDate, extractLongFromDate,
    extractDateFromString, extractStringFromDateTZ, createDateFromStringTZ
  * ``file:`` fileName/parentPath/fileExtension/removeExtension/
    pathElement (FileEL.java — pure path-string functions)
  * runtime-metadata families resolved at TRANSLATION time from an
    :class:`ELContext` (the reference evaluates them against the SDC
    runtime; a ported pipeline carries the same metadata in its export
    JSON, which ``from_sdc_config`` threads through): ``pipeline:id/
    name/title/version``, ``sdc:id/hostname``, ``jvm:maxMemoryMB``,
    ``runtime:conf/loadResource``, ``offset:column``, ``vault:read/
    readWithDelay`` (injected secrets map), ``alert:info``
  * literals, arithmetic and comparison operators pass through
    (EL and SQL share them); ``&&``/``||``/``!`` -> AND/OR/NOT

Semantics are translated, not just names (StringEL.java:46-67 is JAVA
substring — 0-based beginIndex, exclusive endIndex — while SQL substr is
1-based position + LENGTH; indexOf is 0-based/-1-on-miss vs instr's
1-based/0-on-miss; str:matches anchors the whole string like Java
``String.matches``; time:trimDate/trimTime follow TimeNowEL.java:54-80,
which keeps sub-second millis). All operator/function rewriting is
literal-safe: single-quoted strings are never touched, so
``== 'a&&b'`` survives the ``&&`` -> AND pass intact.

Known approximations (documented, columnar data model — SURVEY §1.2):
  * ``record:exists('/p')`` -> ``p IS NOT NULL`` — Spark columns have no
    present-but-null state; absent ≈ NULL here.
  * ``str:urlEncode/urlDecode`` drop the charset argument (UTF-8 only).
  * ``str:truncate(NULL, n)`` yields NULL (reference returns "").
  * record HEADER functions (RecordEL.java:221-310) read metadata COLUMNS
    (``_record_id``/``_record_creator``/``_record_path``, ``_error_*``,
    ``_event_*``) — the columnar form of the reference's record header;
    origins and the error/event sinks attach them
    (processors.attach_record_headers, precondition_filter error lane).
  * delimited-record helpers (``record:dValue`` etc., RecordEL.java:
    332-480) read a ``_delimited array<struct<header,value>>`` column —
    the columnar form of the reference's LIST root for delimited data
    with header spill (sources/formats.py can emit it).
  * ``time:extractStringFromDateTZ``/``createDateFromStringTZ`` assume
    the session zone is UTC (this engine fixes it) so tz adjustment is
    from_utc_timestamp/to_utc_timestamp.
  * ``drift:*`` (hive-protolib metadata drift) is not expression-level in
    this engine: schema drift is handled natively by the lake layer's
    schema evolution (lake/table.py merge_schema) — drift EL calls raise
    with that pointer.
  * NOT expression-translatable, raise by name (documented residual):
    ``field:field`` and ``record:fieldAttribute(OrDefault)`` — per-FIELD
    context/attributes have no columnar analog here.

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
    "str:regExCapture": "regexp_extract",  # (str, regex, group) — same order
    "str:regexCapture": "regexp_extract",  # docs list both spellings
    "str:contains": "contains",
    "str:startsWith": "startswith",
    "str:endsWith": "endswith",
    "math:abs": "abs",
    "math:ceil": "ceil",
    "math:floor": "floor",
    "math:max": "greatest",
    "math:min": "least",
    "math:round": "round",
    "time:millisecondsToDateTime": "timestamp_millis",
    "time:extractStringFromDate": "date_format",
    "time:dateTimeToMilliseconds": "unix_millis",
}

_LITERAL_SPLIT = re.compile(r"('[^']*')")
_NS_FN = re.compile(r"\b([A-Za-z]+):([A-Za-z]+)\s*\(")
_INT = re.compile(r"^-?\d+$")

# Spark typeof() -> SDC Field.Type name (api/.../Field.java Type enum)
_SDC_TYPE_CASE = (
    "CASE WHEN typeof({c}) LIKE 'decimal%' THEN 'DECIMAL' "
    "WHEN typeof({c}) LIKE 'map%' THEN 'MAP' "
    "WHEN typeof({c}) LIKE 'array%' THEN 'LIST' "
    "WHEN typeof({c}) LIKE 'struct%' THEN 'LIST_MAP' "
    "ELSE CASE typeof({c}) WHEN 'string' THEN 'STRING' "
    "WHEN 'int' THEN 'INTEGER' WHEN 'bigint' THEN 'LONG' "
    "WHEN 'smallint' THEN 'SHORT' WHEN 'tinyint' THEN 'BYTE' "
    "WHEN 'double' THEN 'DOUBLE' WHEN 'float' THEN 'FLOAT' "
    "WHEN 'boolean' THEN 'BOOLEAN' WHEN 'date' THEN 'DATE' "
    "WHEN 'timestamp' THEN 'DATETIME' WHEN 'timestamp_ntz' THEN 'DATETIME' "
    "WHEN 'binary' THEN 'BYTE_ARRAY' ELSE upper(typeof({c})) END END"
)


def _path_to_column(path: str) -> str:
    """'/Data/text' -> Data.text ; '/text' -> text ; "/a[2]/b" -> a[2].b"""
    parts = [p for p in path.split("/") if p]
    return ".".join(parts)


path_to_column = _path_to_column  # public: config porting (plans/spec.py)


def _map_code_segments(s: str, fn) -> str:
    """Apply ``fn`` to the non-literal segments of ``s`` only; single-quoted
    literals pass through untouched (re.split with a capture group yields
    [code, literal, code, literal, ...])."""
    parts = _LITERAL_SPLIT.split(s)
    return "".join(p if i % 2 else fn(p) for i, p in enumerate(parts))


def _literal_spans(s: str) -> list[tuple[int, int]]:
    return [m.span() for m in _LITERAL_SPLIT.finditer(s)]


def _split_top_args(argstr: str) -> list[str]:
    """Split a call's argument string on top-level commas (quote- and
    paren-aware)."""
    args, depth, in_q, start = [], 0, False, 0
    for i, ch in enumerate(argstr):
        if in_q:
            if ch == "'":
                in_q = False
        elif ch == "'":
            in_q = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(argstr[start:i].strip())
            start = i + 1
    tail = argstr[start:].strip()
    if tail or args:
        args.append(tail)
    return args


def _rewrite_calls(s: str, name: str, build) -> str:
    """Replace every ``name( args )`` call outside string literals with
    ``build(args_list)``. Paren matching is quote-aware, so arguments may
    contain literals, commas-in-literals, and nested calls; rewriting
    proceeds innermost-last (the outer call is rebuilt from already-final
    text only if ``build`` leaves the args as-is — nested special forms are
    handled by the caller's fixpoint loop in :func:`el_to_sql`)."""
    pat = re.compile(r"\b" + re.escape(name).replace(r"\:", ":") + r"\s*\(")
    while True:
        spans = _literal_spans(s)
        m = None
        for cand in pat.finditer(s):
            if not any(a <= cand.start() < b for a, b in spans):
                m = cand
                break
        if m is None:
            return s
        depth, in_q, j = 1, False, m.end()
        while j < len(s) and depth:
            ch = s[j]
            if in_q:
                in_q = ch != "'"
            elif ch == "'":
                in_q = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            j += 1
        if depth:
            raise ValueError(f"unbalanced parentheses in EL call {name!r}: {s!r}")
        args = _split_top_args(s[m.end(): j - 1])
        s = s[: m.start()] + build(args) + s[j:]


def _quoted(arg: str) -> str | None:
    """The string inside ``arg`` if it is a plain quoted literal, else None."""
    a = arg.strip()
    if len(a) >= 2 and a[0] == "'" and a[-1] == "'" and "'" not in a[1:-1]:
        return a[1:-1]
    return None


def _record_path_arg(fn: str, args: list[str]) -> str:
    p = _quoted(args[0]) if args else None
    if p is None:
        raise ValueError(f"{fn} requires a quoted field path, got {args!r}")
    return _path_to_column(p)


def _sub(a: str, delta: int) -> str:
    """``a + delta`` folded when ``a`` is an int literal."""
    if _INT.match(a.strip()):
        return str(int(a.strip()) + delta)
    return f"({a}) + {delta}" if delta >= 0 else f"({a}) - {-delta}"


# special forms: ns:fn -> builder(args) -> SQL text. Each translates
# ARGUMENTS, not just the name (Java vs SQL indexing conventions).
def _special_forms() -> dict:
    def substring(args):
        if len(args) != 3:
            raise ValueError("str:substring takes (string, beginIndex, endIndex)")
        s, b, e = args
        # Java: 0-based begin, exclusive end (clamped to length; begin>len
        # -> ""). SQL substr: 1-based pos + LENGTH; it clamps the same way
        # and returns '' for non-positive length, matching the e<=b case.
        if _INT.match(b.strip()) and _INT.match(e.strip()):
            length = str(int(e.strip()) - int(b.strip()))
        else:
            length = f"({e}) - ({b})"
        return f"substr({s}, {_sub(b, 1)}, {length})"

    def index_of(args):
        if len(args) != 2:
            raise ValueError("str:indexOf takes (string, substring)")
        # Java indexOf: 0-based, -1 on miss; instr: 1-based, 0 on miss
        return f"(instr({args[0]}, {args[1]}) - 1)"

    def matches(args):
        if len(args) != 2:
            raise ValueError("str:matches takes (string, regex)")
        s, rx = args
        lit = _quoted(rx)
        if lit is not None:
            return f"regexp_like({s}, '^(?:{lit})$')"
        return f"regexp_like({s}, concat('^(?:', {rx}, ')$'))"

    def url_code(sql_fn):
        def build(args):
            # charset arg (if present) is dropped: Spark url_encode/_decode
            # are UTF-8 only (the only charset stock configs use)
            return f"{sql_fn}({args[0]})"

        return build

    def trim_date(args):
        # TimeNowEL.trimDate: date fields -> 1970-01-01, time-of-day KEPT
        # (including millis). time-of-day = millis since local midnight.
        (d,) = args
        return (
            f"timestamp_millis(unix_millis({d}) - "
            f"unix_millis(date_trunc('DAY', {d})))"
        )

    def trim_time(args):
        # TimeNowEL.trimTime zeroes h/m/s but NOT millis (Date.setHours/
        # setMinutes/setSeconds) — midnight + millis-within-second.
        (d,) = args
        return (
            f"timestamp_millis(unix_millis(date_trunc('DAY', {d})) + "
            f"pmod(unix_millis({d}), 1000))"
        )

    def rec_value(args):
        return _record_path_arg("record:value", args)

    def rec_value_or_default(args):
        if len(args) != 2:
            raise ValueError("record:valueOrDefault takes (path, default)")
        return f"coalesce({_record_path_arg('record:valueOrDefault', args)}, {args[1]})"

    def rec_exists(args):
        return f"({_record_path_arg('record:exists', args)} IS NOT NULL)"

    def rec_type(args):
        return _SDC_TYPE_CASE.format(c=_record_path_arg("record:type", args))

    def drift(args):
        raise ValueError(
            "drift:* EL is not expression-level here — schema drift is "
            "handled natively by lake schema evolution (lake/table.py)"
        )

    def truncate(args):
        if len(args) != 2:
            raise ValueError("str:truncate takes (string, endIndex)")
        return f"left({args[0]}, {args[1]})"

    # XML entity escaping (StringEL.java:270-296, commons-text
    # StringEscapeUtils). Approximation: the five XML entities ('&' first
    # on escape, last on unescape); escapeXml10's control-char stripping is
    # not replicated (no control chars survive the engine's text decoders).
    _XML = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&apos;")]

    # the apostrophe is emitted as chr(39), never as an escaped quote
    # literal: the translator's own quote-state scanners (and EL source
    # text) have no backslash-escape concept, so a generated '\'' would
    # desynchronize any later rewrite pass over the same expression
    def escape_xml(args):
        (s,) = args
        out = s
        for ch, ent in _XML:
            lit = "chr(39)" if ch == "'" else f"'{ch}'"
            out = f"replace({out}, {lit}, '{ent}')"
        return out

    def unescape_xml(args):
        (s,) = args
        out = s
        for ch, ent in reversed(_XML):
            lit = "chr(39)" if ch == "'" else f"'{ch}'"
            out = f"replace({out}, '{ent}', {lit})"
        return out

    def b64_encode(args):
        # Base64EL.java:32-44 (string, urlSafe[, charset]): commons-codec
        # urlSafe uses -_ and omits '=' padding; charset UTF-8 only here
        s = args[0]
        out = f"base64(cast({s} AS BINARY))"
        if len(args) >= 2 and args[1].strip().lower() == "true":
            out = f"replace(translate({out}, '+/', '-_'), '=', '')"
        return out

    def b64_decode(args):
        return f"cast(unbase64({args[0]}) AS STRING)"

    # ---- time: second batch (TimeNowEL.java:118-230) -------------------
    def extract_long_from_date(args):
        # format, strip non-digits, parse as long (TimeNowEL.java:126-130)
        d, fmt = args
        return (
            f"cast(regexp_replace(date_format({d}, {fmt}), '[^0-9]', '') "
            "AS BIGINT)"
        )

    def extract_date_from_string(args):
        s, fmt = args
        return f"to_timestamp({s}, {fmt})"

    def extract_string_from_date_tz(args):
        # SDC formats the instant in the given zone; session zone is UTC
        # here, so the shift is from_utc_timestamp
        d, tz, fmt = args
        return f"date_format(from_utc_timestamp({d}, {tz}), {fmt})"

    def create_date_from_string_tz(args):
        s, tz, fmt = args
        return f"to_utc_timestamp(to_timestamp({s}, {fmt}), {tz})"

    # ---- file: path-string functions (FileEL.java:36-120) --------------
    def file_name(args):
        return f"regexp_extract({args[0]}, '[^/]*$', 0)"

    def parent_path(args):
        # FilenameUtils.getFullPathNoEndSeparator: '/file.txt' -> '/',
        # 'file.txt' -> '', '/a/b/c.txt' -> '/a/b'
        (p,) = args
        return (
            f"CASE WHEN regexp_like({p}, '^/[^/]*$') THEN '/' "
            f"ELSE regexp_replace({p}, '/?[^/]*$', '') END"
        )

    def file_extension(args):
        # extension only counts after the LAST separator (commons-io)
        return f"regexp_extract({args[0]}, '\\\\.([^./]+)$', 1)"

    def remove_extension(args):
        return f"regexp_replace({args[0]}, '\\\\.[^./]*$', '')"

    def path_element(args):
        # FileEL.pathElement: '/path/to/f.txt' -> index 0 = 'path';
        # negative counts from the end; out-of-range -> null.
        # element_at is 1-based for positives and already end-relative for
        # negatives, so only non-negative indexes shift by one.
        p, i = args
        elems = f"filter(split({p}, '/'), x -> x != '')"
        if _INT.match(i.strip()):
            idx = str(int(i.strip()) + 1) if int(i.strip()) >= 0 else i.strip()
        else:
            idx = f"(CASE WHEN ({i}) >= 0 THEN ({i}) + 1 ELSE ({i}) END)"
        return f"try_element_at({elems}, {idx})"

    # ---- record: header + delimited helpers (RecordEL.java) ------------
    # Header functions read metadata COLUMNS — the columnar form of the
    # reference's per-record header (attach_record_headers / error lane).
    def header_col(col):
        return lambda args: col

    def rec_attr_or_default(args):
        if len(args) != 2:
            raise ValueError("record:attributeOrDefault takes (name, default)")
        return (
            f"coalesce({_record_path_arg('record:attributeOrDefault', args)},"
            f" {args[1]})"
        )

    # Delimited-data records (LIST of {header, value} maps,
    # RecordEL.java:332-480) live in a `_delimited` column of
    # array<struct<header string, value string>>.
    _D = "_delimited"

    def d_value(args):
        return f"try_element_at(filter({_D}, x -> x.header = {args[0]}), 1).value"

    def d_value_at(args):
        return f"try_element_at({_D}, {_sub(args[0], 1)}).value"

    def d_index(args):
        # Java: first index, 0-based, -1 on miss; array_position is
        # 1-based, 0 on miss — the -1 shift maps both conventions at once
        return f"(array_position(transform({_D}, x -> x.header), {args[0]}) - 1)"

    def d_exists(args):
        return f"exists({_D}, x -> x.header = {args[0]})"

    def d_is_dup_header(args):
        return f"(size(filter({_D}, x -> x.header = {args[0]})) > 1)"

    def d_has_dup_headers(args):
        return (
            f"(size({_D}) > "
            f"size(array_distinct(transform({_D}, x -> x.header))))"
        )

    def d_to_map(args):
        # duplicate headers: LAST wins (the reference's LinkedHashMap.put);
        # map_from_entries raises on dup keys, so keep only each header's
        # final occurrence first (O(cols²) per row — cols, not rows)
        idx = (
            f"transform({_D}, (x, i) -> "
            "struct(x.header AS header, x.value AS value, i AS i))"
        )
        keep = (
            f"filter({idx}, e -> NOT exists({idx}, "
            "y -> y.header = e.header AND y.i > e.i))"
        )
        return f"map_from_entries(transform({keep}, e -> struct(e.header, e.value)))"

    def field_ctx(args):
        raise ValueError(
            "field:field / record:fieldAttribute(OrDefault) have no "
            "columnar analog (per-field context/attributes) — rewrite "
            "the expression against the column directly"
        )

    return {
        "str:escapeXML10": escape_xml,
        "str:escapeXML11": escape_xml,
        "str:unescapeXML": unescape_xml,
        "base64:encodeString": b64_encode,
        "base64:decodeString": b64_decode,
        "base64:decodeBytes": lambda args: f"unbase64({args[0]})",
        "record:value": rec_value,
        "record:attribute": rec_value,  # headers are columns here (SURVEY §1.2)
        "record:valueOrDefault": rec_value_or_default,
        "record:exists": rec_exists,
        "record:type": rec_type,
        "str:substring": substring,
        "str:indexOf": index_of,
        "str:matches": matches,
        "str:urlEncode": url_code("url_encode"),
        "str:urlDecode": url_code("url_decode"),
        "str:truncate": truncate,
        "time:trimDate": trim_date,
        "time:trimTime": trim_time,
        "time:extractLongFromDate": extract_long_from_date,
        "time:extractDateFromString": extract_date_from_string,
        "time:extractStringFromDateTZ": extract_string_from_date_tz,
        "time:createDateFromStringTZ": create_date_from_string_tz,
        "file:fileName": file_name,
        "file:parentPath": parent_path,
        "file:fileExtension": file_extension,
        "file:removeExtension": remove_extension,
        "file:pathElement": path_element,
        "record:id": header_col("_record_id"),
        "record:creator": header_col("_record_creator"),
        "record:path": header_col("_record_path"),
        "record:attributeOrDefault": rec_attr_or_default,
        "record:errorCode": header_col("_error_code"),
        "record:errorMessage": header_col("_error_message"),
        "record:errorStage": header_col("_error_stage"),
        "record:errorPipeline": header_col("_error_pipeline"),
        "record:errorCollectorId": header_col("_error_collector_id"),
        "record:errorTime": header_col("_error_time"),
        "record:eventType": header_col("_event_type"),
        "record:eventVersion": header_col("_event_version"),
        "record:eventCreation": header_col("_event_creation"),
        "record:dValue": d_value,
        "record:dValueAt": d_value_at,
        "record:dIndex": d_index,
        "record:dExists": d_exists,
        "record:dIsDupHeader": d_is_dup_header,
        "record:dHasDupHeader": d_has_dup_headers,
        "record:dHasDupHeaders": d_has_dup_headers,
        "record:dToMap": d_to_map,
        "field:field": field_ctx,
        "record:fieldAttribute": field_ctx,
        "record:fieldAttributeOrDefault": field_ctx,
        "drift:names": drift,
        "drift:type": drift,
        "drift:size": drift,
        "drift:order": drift,
    }


_SPECIAL = _special_forms()


def _sql_str_lit(value: str) -> str:
    """A safe SQL string literal. Apostrophes are emitted as chr(39)
    concat parts — never backslash-escaped (see the escape_xml note:
    the translator's quote-state scanners have no escape concept)."""
    s = str(value)
    if "'" not in s:
        return f"'{s}'"
    parts: list[str] = []
    for i, piece in enumerate(s.split("'")):
        if i:
            parts.append("chr(39)")
        if piece:
            parts.append(f"'{piece}'")
    return f"concat({', '.join(parts)})" if len(parts) > 1 else (parts or ["''"])[0]


class ELContext:
    """Runtime metadata for the translation-time EL families.

    The reference evaluates ``pipeline:*``/``sdc:*``/``jvm:*``/
    ``runtime:*``/``offset:*``/``vault:*`` against the live Data Collector
    runtime (PipelineEL/SdcEL/JvmEL/RuntimeEL in container/.../el/). Those
    values are constants for any one pipeline run, so this engine resolves
    them at TRANSLATION time into literals: the pipeline metadata comes
    from the export JSON itself (``from_sdc_config`` threads it through),
    host identity defaults to the driver host, and secrets/runtime-conf
    are injected dicts (the credential-store / sdc.properties analog).
    Missing values raise by name at translation — the same failure mode as
    an unknown function, never a silent None.
    """

    def __init__(
        self,
        pipeline: dict | None = None,
        sdc_id: str | None = None,
        sdc_hostname: str | None = None,
        jvm_max_memory_mb: int | None = None,
        runtime_conf: dict | None = None,
        resources_dir: str | None = None,
        offsets: dict | None = None,
        vault: dict | None = None,
        alert_info: str | None = None,
    ):
        self.pipeline = pipeline or {}
        self.sdc_id = sdc_id
        self.sdc_hostname = sdc_hostname
        self.jvm_max_memory_mb = jvm_max_memory_mb
        self.runtime_conf = runtime_conf or {}
        self.resources_dir = resources_dir
        self.offsets = offsets or {}
        self.vault = vault or {}
        self.alert_info = alert_info


def _context_forms(ctx: ELContext | None) -> dict:
    ctx = ctx or ELContext()

    def need(value, what):
        def build(args):
            if value is None:
                raise ValueError(
                    f"{what} needs an ELContext value — pass context= to "
                    "el_to_sql (from_sdc_config threads pipeline metadata "
                    "automatically)"
                )
            return _sql_str_lit(value)

        return build

    def pipeline_meta(key):
        def build(args):
            if key not in ctx.pipeline:
                raise ValueError(
                    f"pipeline:{key} needs ELContext.pipeline[{key!r}]"
                )
            return _sql_str_lit(ctx.pipeline[key])

        return build

    def hostname(args):
        if ctx.sdc_hostname is not None:
            return _sql_str_lit(ctx.sdc_hostname)
        import socket

        return _sql_str_lit(socket.gethostname())

    def jvm_max_memory(args):
        if ctx.jvm_max_memory_mb is None:
            raise ValueError("jvm:maxMemoryMB needs ELContext.jvm_max_memory_mb")
        return str(int(ctx.jvm_max_memory_mb))

    def lookup(table: dict, ns_fn: str, what: str):
        def build(args):
            key = _quoted(args[0]) if args else None
            if key is None:
                raise ValueError(f"{ns_fn} requires a quoted literal key")
            if key not in table:
                raise ValueError(f"{ns_fn}({key!r}): no {what} entry in ELContext")
            return _sql_str_lit(table[key])

        return build

    def load_resource(args):
        # RuntimeEL.loadResource(file, restricted): reads $SDC_RESOURCES/
        # file at evaluation time — here at translation time from
        # ctx.resources_dir (the 'restricted' ownership check is the
        # deployment's concern; the flag is accepted and ignored)
        import os

        fname = _quoted(args[0]) if args else None
        if fname is None or ctx.resources_dir is None:
            raise ValueError(
                "runtime:loadResource needs a quoted file name and "
                "ELContext.resources_dir"
            )
        with open(os.path.join(ctx.resources_dir, fname)) as f:
            return _sql_str_lit(f.read().strip())

    return {
        "pipeline:id": pipeline_meta("id"),
        "pipeline:name": pipeline_meta("name"),
        "pipeline:title": pipeline_meta("title"),
        "pipeline:version": pipeline_meta("version"),
        "sdc:id": need(ctx.sdc_id, "sdc:id"),
        "sdc:hostname": hostname,
        "jvm:maxMemoryMB": jvm_max_memory,
        "runtime:conf": lookup(ctx.runtime_conf, "runtime:conf", "runtime_conf"),
        "runtime:loadResource": load_resource,
        "offset:column": lookup(ctx.offsets, "offset:column", "offsets"),
        "vault:read": lookup(ctx.vault, "vault:read", "vault"),
        "vault:readWithDelay": lookup(ctx.vault, "vault:readWithDelay", "vault"),
        "alert:info": need(ctx.alert_info, "alert:info"),
    }


def el_to_sql(el: str, context: ELContext | None = None) -> str:
    """Translate one EL string (with or without the ``${...}`` wrapper)
    into a Spark SQL expression string. ``context`` supplies the
    runtime-metadata families (see :class:`ELContext`)."""
    s = el.strip()
    if s.startswith("${") and s.endswith("}"):
        s = s[2:-1]

    forms = dict(_SPECIAL)
    forms.update(_context_forms(context))

    # special forms (argument-translating): fixpoint so nested special
    # calls — str:substring(record:value('/a'), 0, str:indexOf(x, 'b')) —
    # resolve inner-to-outer across passes
    for _ in range(32):
        before = s
        for name, build in forms.items():
            s = _rewrite_calls(s, name, build)
        if s == before:
            break
    else:  # pragma: no cover — 32 nesting levels of special forms
        raise ValueError(f"EL expression too deeply nested: {el!r}")

    s = re.sub(r"\btime:now\s*\(\s*\)", "current_timestamp()", s)

    def repl(m: re.Match) -> str:
        key = f"{m.group(1)}:{m.group(2)}"
        if key in _FN_MAP:
            return _FN_MAP[key] + "("
        raise ValueError(
            f"unsupported EL function {key!r} — add it to functions/el.py "
            "or rewrite the expression in Spark SQL"
        )

    def code_pass(seg: str) -> str:
        seg = _NS_FN.sub(repl, seg)
        # boolean operators: EL uses Java syntax, SQL uses keywords. '!'
        # only when not '!=' (negation vs inequality).
        seg = seg.replace("&&", " AND ").replace("||", " OR ")
        seg = re.sub(r"!(?!=)", " NOT ", seg)
        return re.sub(r"\s+", " ", seg)

    return _map_code_segments(s, code_pass).strip()


def el_expr(el: str, context: ELContext | None = None) -> Column:
    """EL string -> Spark Column (the Expression Evaluator's field form)."""
    return F.expr(el_to_sql(el, context))


_TMPL_TIME_FMT = {
    "YYYY": "yyyy", "YY": "yy", "MM": "MM", "DD": "dd",
    "hh": "HH", "mm": "mm", "ss": "ss", "SSS": "SSS",
}
_TMPL_TOKEN = re.compile(r"\$\{([^}]*)\}")


def el_dir_template(template: str, time_col: str = "ts") -> Column:
    """Directory-template EL -> per-row resolved path Column.

    The reference's file sinks build output directories from templates like
    ``/out/${YYYY()}-${MM()}-${DD()}-${hh()}/${record:value('/type')}``
    (HdfsTargetConfigBean.java:175-187; the no-arg time functions are
    TimeEL.java:50-99, resolved against the configured ``timeDriver`` —
    here ``time_col``, the event-time column, matching the reference's
    record-field time basis). The Spark-native execution of a time-based
    directory layout is exactly this column + ``write.partitionBy`` — each
    distinct resolved path becomes one output directory, written in the
    same pass (the reference hand-manages one writer per open directory;
    Spark's committer does it declaratively).

    Time zone: the session zone (UTC in this engine) — the reference's
    ``Data Time Zone`` config, fixed to its default.
    """
    cols: list[Column] = []
    last = 0
    for m in _TMPL_TOKEN.finditer(template):
        if m.start() > last:
            cols.append(F.lit(template[last:m.start()]))
        token = m.group(1).strip()
        tm = re.fullmatch(r"([A-Za-z]+)\(\)", token)
        ev = re.fullmatch(r"every\(\s*(\d+)\s*,\s*([A-Za-z]+)\(\)\s*\)", token)
        if tm and tm.group(1) in _TMPL_TIME_FMT:
            cols.append(F.date_format(F.col(time_col), _TMPL_TIME_FMT[tm.group(1)]))
        elif ev and ev.group(2) in _TMPL_TIME_FMT:
            # ${every(N, mm())}: the directory rolls every N units — the
            # unit value floored to a multiple of N (the reference's
            # ExtraTimeEL marker, resolved by its path template engine).
            # The reference's every() accepts hh/mm/ss only
            # (PathTemplateEL); wider units keep their natural width
            # instead of a wrong 2-char pad.
            n = int(ev.group(1))
            fmt = _TMPL_TIME_FMT[ev.group(2)]
            unit = F.date_format(F.col(time_col), fmt)
            floored = ((unit.cast("int") / n).cast("int") * n).cast("string")
            cols.append(F.lpad(floored, len(fmt), "0"))
        else:
            cols.append(F.expr(el_to_sql("${" + token + "}")).cast("string"))
        last = m.end()
    if last < len(template):
        cols.append(F.lit(template[last:]))
    return F.concat(*cols) if cols else F.lit(template)


def el_condition(el: str, context: ELContext | None = None) -> Column:
    """EL predicate -> boolean Column (preconditions / stream selector)."""
    return el_expr(el, context).cast("boolean")
