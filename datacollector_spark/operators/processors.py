"""Processor-stage operators — the reference's per-record processors
(SURVEY.md §2.3) re-expressed as columnar DataFrame transforms.

Every function takes and returns a DataFrame; compose them like SDC wires
stages into lanes. Nothing here is per-row Python: the slow-path escapes
(custom masking, scripting) are Arrow-batched pandas UDFs.

Reference analogs cited per function. The reference mutates a record tree in
place; we project columns — same semantics, columnar execution, and Catalyst
fuses consecutive stages into one WholeStageCodegen span, which is the scale
story: a 10-stage pipeline costs one pass over the data.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ----------------------------------------------------------------- routing
def stream_selector(
    df: DataFrame, conditions: Sequence[tuple[str, str]], default_lane: str = "default"
) -> dict[str, DataFrame]:
    """Route rows to named lanes by ORDERED SQL predicates; first match wins.

    basic-lib/.../processor/selector/SelectorProcessor.java:114. Returns
    {lane: DataFrame}.

    Each lane is a PLAIN conjunctive filter — its own predicate AND the
    negation of every earlier lane's (null predicates count as non-matches,
    like the CASE fall-through the reference evaluates). Plain filters are
    what Catalyst can push into the parquet scan (a routing CASE column
    blocks pushdown — measured in the explain audit): at 100 TB a selector
    lane that reads 1% of rows scans 1% of row groups instead of
    post-filtering the full table."""
    lanes: dict[str, DataFrame] = {}
    prev = F.lit(False)
    for lane, cond in conditions:
        p = F.expr(cond)
        lanes[lane] = df.where(p & ~prev)
        # null p must fall through to LATER lanes, so the accumulator
        # treats it as false (matching CASE WHEN semantics)
        prev = prev | F.coalesce(p.cast("boolean"), F.lit(False))
    lanes[default_lane] = df.where(~prev)
    return lanes


def precondition_filter(
    df: DataFrame,
    condition: str,
    required_fields: Sequence[str] = (),
    stage_name: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(passing, error) split — per-stage preconditions + required fields
    (container/.../runner/PreconditionsPredicate.java:52-74,
    RequiredFieldsPredicate.java). The error lane is the reference's
    error-sink routing (ErrorSink.java).

    With ``stage_name``, the error lane carries the reference's
    error-record header as metadata columns (``_error_stage``,
    ``_error_code`` CONTAINER_0051/0050, ``_error_message``,
    ``_error_time`` millis) — the columns ``record:errorCode()`` etc.
    read after EL translation (functions/el.py record header forms)."""
    pred = F.expr(condition) if condition else F.lit(True)
    for field in required_fields:
        pred = pred & F.col(field).isNotNull()
    err = df.where(~F.coalesce(pred, F.lit(False)))
    if stage_name is not None:
        code = "CONTAINER_0050" if required_fields else "CONTAINER_0051"
        msg = (
            f"missing required fields {list(required_fields)}"
            if required_fields
            else f"preconditions not met: {condition!r}"
        )
        err = err.withColumns(
            {
                "_error_stage": F.lit(stage_name),
                "_error_code": F.lit(code),
                "_error_message": F.lit(msg),
                "_error_time": F.unix_millis(F.current_timestamp()),
            }
        )
    return df.where(pred), err


def attach_record_headers(
    df: DataFrame, creator: str, offset_cols: Sequence[str], path: str = ""
) -> DataFrame:
    """Attach the reference's record-header identity as metadata columns —
    ``_record_id`` = ``creator::offset`` (RecordImpl.java sourceId),
    ``_record_creator``, ``_record_path`` — read by the EL record-header
    functions (record:id()/creator()/path()). Deterministic: the id is a
    pure function of the origin name + the record's own offset columns,
    exactly how the reference builds sourceRecord ids."""
    rid = F.concat_ws(
        "::", F.lit(creator), *[F.col(c).cast("string") for c in offset_cols]
    )
    return df.withColumns(
        {
            "_record_id": rid,
            "_record_creator": F.lit(creator),
            "_record_path": F.lit(path or creator),
        }
    )


# ------------------------------------------------------------- projections
def field_remover(df: DataFrame, columns: Sequence[str], keep: bool = False) -> DataFrame:
    """KEEP / REMOVE listed fields — fieldfilter/FieldFilterProcessor.java:51-69."""
    if keep:
        return df.select(*[c for c in df.columns if c in set(columns)])
    return df.drop(*columns)


def field_renamer(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    """fieldrenamer/FieldRenamerProcessor.java (regex renames resolved by the
    caller; collisions are an error, matching ToError semantics)."""
    out = df
    for a, b in renames.items():
        if b in out.columns:
            raise ValueError(f"rename collision: {a} -> {b}")
        out = out.withColumnRenamed(a, b)
    return out


def field_order(
    df: DataFrame, order: Sequence[str], extra: str = "error", defaults: dict | None = None
) -> DataFrame:
    """Reorder columns; missing columns get defaults (or error), extras are
    dropped or error — fieldorder/FieldOrderProcessor.java."""
    defaults = defaults or {}
    cols = []
    for c in order:
        if c in df.columns:
            cols.append(F.col(c))
        elif c in defaults:
            cols.append(F.lit(defaults[c]).alias(c))
        else:
            raise ValueError(f"missing column {c} with no default")
    extras = [c for c in df.columns if c not in set(order)]
    if extras and extra == "error":
        raise ValueError(f"unexpected columns {extras}")
    return df.select(*cols)


def expression_evaluator(df: DataFrame, expressions: dict[str, str]) -> DataFrame:
    """Set columns from SQL expressions — the EL Expression Evaluator
    (basic-lib/.../processor/expression/ExpressionProcessor.java); the EL
    function families map to pyspark.sql.functions (SURVEY.md §2.8)."""
    return df.withColumns({name: F.expr(e) for name, e in expressions.items()})


# ------------------------------------------------------------- conversions
def field_type_converter(df: DataFrame, conversions: dict[str, str | T.DataType]) -> DataFrame:
    """Cast columns — fieldtypeconverter/FieldTypeConverterProcessor.java:63-188.
    String->timestamp with a format goes through to_timestamp."""
    out = {}
    for col, target in conversions.items():
        if isinstance(target, str) and target.startswith("timestamp:"):
            out[col] = F.to_timestamp(F.col(col), target.split(":", 1)[1])
        else:
            out[col] = F.col(col).cast(target)
    return df.withColumns(out)


def field_type_converter_by_type(
    df: DataFrame, conversions: dict[str, str]
) -> DataFrame:
    """Whole-TYPE conversion mode — every field whose CURRENT type matches
    is converted (FieldTypeConverterProcessor.java:60-102 BY_TYPE: a
    recursive walk over the record tree applying each matching
    WholeTypeConverterConfig). The Spark form is a schema walk: top-level
    columns, struct fields (recursively), and array elements are cast
    where their type matches.

    ``conversions``: {source_spark_type: target} where source is the
    simpleString of the type to match (``"date"``, ``"bigint"``;
    ``"decimal"`` matches any precision) and target is a Spark type or
    ``"timestamp:<fmt>"`` for parse-through-format."""

    def match(dtype: T.DataType) -> str | None:
        simple = dtype.simpleString()
        for src, target in conversions.items():
            if (
                simple == src
                or (src == "decimal" and simple.startswith("decimal"))
                # SDC DATETIME covers both Spark timestamp flavors
                or (src == "timestamp" and simple == "timestamp_ntz")
            ):
                return target
        return None

    def changes(dtype: T.DataType) -> bool:
        if isinstance(dtype, T.StructType):
            return any(changes(f.dataType) for f in dtype.fields)
        if isinstance(dtype, T.ArrayType):
            return changes(dtype.elementType)
        if isinstance(dtype, T.MapType):
            # the reference's record walk treats MAP entries like fields
            # (values convert; keys stay keys)
            return changes(dtype.valueType)
        return match(dtype) is not None

    def walk(col: Column, dtype: T.DataType) -> Column:
        if isinstance(dtype, T.StructType):
            return F.struct(
                *[
                    (
                        walk(col[f.name], f.dataType)
                        if changes(f.dataType)
                        else col[f.name]
                    ).alias(f.name)
                    for f in dtype.fields
                ]
            )
        if isinstance(dtype, T.ArrayType):
            return F.transform(col, lambda x: walk(x, dtype.elementType))
        if isinstance(dtype, T.MapType):
            return F.transform_values(col, lambda k, v: walk(v, dtype.valueType))
        target = match(dtype)
        if isinstance(target, str) and target.startswith("timestamp:"):
            return F.to_timestamp(col, target.split(":", 1)[1])
        numeric = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
        if dtype.simpleString() == "timestamp_ntz" and isinstance(target, str) and any(
            target.startswith(n) for n in numeric
        ):
            # ntz has no direct numeric cast; via timestamp (session zone
            # is UTC in this engine, so the epoch is the wall-clock epoch)
            return col.cast("timestamp").cast(target)
        return col.cast(target)

    out = {
        f_.name: walk(F.col(f_.name), f_.dataType)
        for f_ in df.schema.fields
        if changes(f_.dataType)
    }
    return df.withColumns(out) if out else df


def value_replacer(
    df: DataFrame,
    null_defaults: dict[str, object] | None = None,
    conditional: Sequence[tuple[str, str, object]] = (),
    null_when: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """NULL backfill + conditional replacement —
    fieldvaluereplacer/FieldValueReplacerProcessor.java.
    ``null_when``: [(column, condition)] sets the column NULL where the
    condition holds (nullReplacerConditionalConfigs)."""
    out = df
    for col, cond in null_when:
        out = out.withColumn(
            col, F.when(F.expr(cond), F.lit(None)).otherwise(F.col(col))
        )
    if null_defaults:
        out = out.withColumns(
            {c: F.coalesce(F.col(c), F.lit(v)) for c, v in null_defaults.items()}
        )
    for col, cond, value in conditional:
        out = out.withColumn(col, F.when(F.expr(cond), F.lit(value)).otherwise(F.col(col)))
    return out


# ----------------------------------------------------------- string shapes
def field_splitter(
    df: DataFrame,
    column: str,
    separator: str,
    to: Sequence[str],
    too_few: str = "keep_null",
    too_many: str = "truncate",
    remaining_to: str | None = None,
    keep_original: bool = True,
) -> DataFrame:
    """Split a string column into N columns by regex —
    splitter/SplitterProcessor.java:95-147 (too-few policy: nulls).

    ``too_many`` is the reference's TooManySplitsAction:
      * ``"to_last_field"`` — limit the split so the last field keeps the
        remaining unsplit text (``str.split(sep, fieldPaths.length)``)
      * ``"to_list"`` — extra splits go to ``remaining_to`` as an array
        (remainingSplitsPath)
      * ``"truncate"`` — extras dropped (pre-round-5 behavior, kept as
        the default for existing callers)
    ``keep_original=False`` is OriginalFieldAction.REMOVE."""
    if too_many == "to_last_field":
        parts = F.split(F.col(column), separator, len(to))
    else:
        parts = F.split(F.col(column), separator)
    out = df.withColumns(
        {name: F.try_element_at(parts, F.lit(i + 1)) for i, name in enumerate(to)}
    )
    if too_many == "to_list" and remaining_to:
        out = out.withColumn(
            remaining_to, F.slice(parts, len(to) + 1, F.greatest(F.size(parts) - len(to), F.lit(0)))
        )
    if not keep_original:
        out = out.drop(column)
    return out


def field_merger(df: DataFrame, into: str, columns: Sequence[str]) -> DataFrame:
    """Compose columns into a struct — fieldmerger/FieldMergerProcessor.java."""
    return df.withColumn(into, F.struct(*[F.col(c) for c in columns]))


def field_flattener(
    df: DataFrame, column: str, separator: str = "_", recursive: bool = False
) -> DataFrame:
    """Flatten a struct column with a name separator —
    fieldflattener/FieldFlattenerProcessor.java. ``recursive`` flattens
    nested structs all the way down (the XML-record flatten-entire-record
    mode): a/b/c becomes a_b_c; non-struct leaves are left as-is."""
    from pyspark.sql import types as T

    def leaves(prefix: str, dtype) -> list:
        out = []
        for f_ in dtype.fields:
            path, name = f"{prefix}.{f_.name}", f"{prefix.replace('.', separator)}{separator}{f_.name}"
            if recursive and isinstance(f_.dataType, T.StructType):
                out.extend(leaves(path, f_.dataType))
            else:
                out.append(F.col(path).alias(name))
        return out

    flat = leaves(column, df.schema[column].dataType)
    return df.select(*[c for c in df.columns if c != column], *flat)


def field_flattener_entire(df: DataFrame, separator: str = "_") -> DataFrame:
    """ENTIRE_RECORD flatten mode — every struct column flattened
    recursively (fieldflattener/FieldFlattenerProcessor.java
    flattenEntireRecord). Non-struct columns pass through in place."""
    out = df
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.StructType):
            out = field_flattener(out, f_.name, separator=separator, recursive=True)
    return out


def field_struct_merge(
    df: DataFrame, from_col: str, to_col: str, overwrite: bool = False
) -> DataFrame:
    """Merge the fields of one struct column into another — the Field
    Merger's MAP-merge semantics (fieldmerger/FieldMergerProcessor.java:
    mergeMapping fromField -> toField; collisions error unless
    overwriteExisting). The source column is consumed. Non-struct source/
    target degrade to a rename/move (the reference's non-map merge is a
    move)."""
    from_t = df.schema[from_col].dataType
    to_t = df.schema[to_col].dataType if to_col in df.columns else None
    if isinstance(from_t, T.StructType) and isinstance(to_t, T.StructType):
        from_names = [f.name for f in from_t.fields]
        clash = [f.name for f in to_t.fields if f.name in set(from_names)]
        if clash and not overwrite:
            raise ValueError(
                f"merge collision on {clash} (set overwriteExisting)"
            )
        kept = [
            F.col(to_col)[f.name].alias(f.name)
            for f in to_t.fields
            if f.name not in set(clash)
        ]
        merged = [F.col(from_col)[n].alias(n) for n in from_names]
        return df.withColumn(to_col, F.struct(*kept, *merged)).drop(from_col)
    if to_col in df.columns and not overwrite:
        raise ValueError(f"merge collision: {to_col} exists (set overwriteExisting)")
    return df.withColumn(to_col, F.col(from_col)).drop(from_col)


def list_pivot(
    df: DataFrame,
    column: str,
    keep_position: bool = False,
    into: str | None = None,
    copy_fields: bool = True,
    original_name_to: str | None = None,
) -> DataFrame:
    """One row per list element — listpivot/ListPivotProcessor.java, the
    reference's only row-multiplying processor. posexplode when positions
    are kept.

    Port knobs (ListPivotDProcessor.java:55-106): ``into`` = newPath (the
    pivoted element lands in a new column, the list column is consumed);
    ``copy_fields=False`` makes the element the whole record;
    ``original_name_to`` = originalFieldNamePath (saveOriginalFieldName)."""
    target = into or column
    if keep_position:
        others = [c for c in df.columns if c != column]
        out = df.select(*others, F.posexplode(column).alias(f"{column}_pos", target))
    elif not copy_fields:
        out = df.select(F.explode(column).alias(target))
    elif into and into != column:
        others = [c for c in df.columns if c != column]
        out = df.select(*others, F.explode(column).alias(target))
    else:
        out = df.withColumn(column, F.explode(column))
    if original_name_to:
        out = out.withColumn(original_name_to, F.lit(column))
    return out


def field_zip(df: DataFrame, into: str, left: str, right: str) -> DataFrame:
    """Element-wise zip of two array columns — zip/FieldZipProcessor.java."""
    return df.withColumn(into, F.arrays_zip(F.col(left), F.col(right)))


# ---------------------------------------------------------------- hashing
def field_hasher(
    df: DataFrame, columns: Sequence[str], target: str, algo: str = "sha256"
) -> DataFrame:
    """Hash selected fields into a target field —
    fieldhasher/FieldHasherProcessor.java (record-hash mode = pass all
    columns). xxhash64 is the fast non-crypto path (murmur3 analog)."""
    joined = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in columns])
    if algo == "md5":
        h = F.md5(joined)
    elif algo == "sha1":
        h = F.sha1(joined)
    elif algo in ("sha256", "sha512"):
        h = F.sha2(joined, int(algo[3:]))
    elif algo == "xxhash64":
        h = F.xxhash64(*[F.col(c) for c in columns]).cast("string")
    elif algo == "crc32":
        h = F.crc32(joined.cast("binary")).cast("string")
    else:
        raise ValueError(f"unknown algo {algo}")
    return df.withColumn(target, h)


# ---------------------------------------------------------------- masking
def field_masker(
    df: DataFrame,
    columns: Sequence[str],
    mask_type: str = "VARIABLE_LENGTH",
    custom_mask: str | None = None,
    regex: str | None = None,
    groups_to_show: int = 0,
) -> DataFrame:
    """Field Masker — fieldmask/FieldMaskProcessor.java, MaskType.java:26-30.

    FIXED_LENGTH: 10 x's. VARIABLE_LENGTH: one x per char. CUSTOM: mask
    pattern where '#' reveals the original char. REGEX: mask everything
    except the first `groups_to_show` capture groups.
    """
    def mask_col(c: Column) -> Column:
        if mask_type == "FIXED_LENGTH":
            return F.when(c.isNotNull(), F.lit("x" * 10))
        if mask_type == "VARIABLE_LENGTH":
            return F.regexp_replace(c, ".", "x")
        if mask_type == "CUSTOM":
            if not custom_mask:
                raise ValueError("CUSTOM mask requires custom_mask")
            # '#' keeps the source char at that position; everything past the
            # mask is dropped (reference semantics)
            parts = []
            for i, ch in enumerate(custom_mask):
                src = F.substring(c, i + 1, 1)
                parts.append(src if ch == "#" else F.when(src != "", F.lit(ch)).otherwise(F.lit("")))
            return F.when(c.isNotNull(), F.concat(*parts))
        if mask_type == "REGEX":
            if not regex:
                raise ValueError("REGEX mask requires regex")
            shown = F.concat(
                *[F.regexp_extract(c, regex, g + 1) for g in range(groups_to_show)]
            ) if groups_to_show else F.lit("")
            return F.when(c.rlike(regex), shown).otherwise(F.regexp_replace(c, ".", "x"))
        raise ValueError(f"unknown mask_type {mask_type}")

    return df.withColumns({c: mask_col(F.col(c)) for c in columns})


# ------------------------------------------------------------ parse stages
def json_parser(df: DataFrame, column: str, schema: T.StructType | str, into: str) -> DataFrame:
    """Parse a JSON string field — jsonparser/JsonParserProcessor.java."""
    return df.withColumn(into, F.from_json(F.col(column), schema))


def xml_parser(df: DataFrame, column: str, schema: T.StructType | str, into: str) -> DataFrame:
    """Parse an XML string field — xmlparser/XmlParserProcessor.java
    (schema-declared, like json_parser; Spark's from_xml)."""
    from datacollector_spark.sources.formats import parse_xml

    return df.withColumn(into, parse_xml(F.col(column), schema))


def log_parser(df: DataFrame, column: str, pattern: str, groups: dict[str, int]) -> DataFrame:
    """Regex log parse into fields — logparser/LogParserProcessor.java
    (grok/apache formats reduce to a regex with named groups)."""
    return df.withColumns(
        {name: F.regexp_extract(F.col(column), pattern, idx) for name, idx in groups.items()}
    )


def base64_codec(df: DataFrame, column: str, into: str, decode: bool = False) -> DataFrame:
    """base64/Base64BaseProcesssor.java."""
    col = F.unbase64(F.col(column)) if decode else F.base64(F.col(column))
    return df.withColumn(into, col)


# -------------------------------------------------------------- lookup/join
def static_lookup(
    df: DataFrame, mapping: dict, key_column: str, value_column: str, default=None
) -> DataFrame:
    """Local KV lookup — basic-lib/.../processor/kv/local/LocalLookupProcessor.java.
    Literal map, evaluated JVM-side (no shuffle, no UDF). ``key_column``
    may be any SQL expression (the reference's keyExpr EL is an
    expression, not just a field)."""
    pairs = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    m = F.create_map(*pairs)
    looked = m[F.expr(key_column)]
    if default is not None:
        looked = F.coalesce(looked, F.lit(default))
    return df.withColumn(value_column, looked)


def broadcast_lookup(
    df: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
    multiple: str = "FIRST_ONLY",
    order_by: str | None = None,
) -> DataFrame:
    """Dimension lookup as a broadcast-hash join — the scale-correct form of
    JDBC/HBase/Redis lookups (jdbc-lib/.../jdbclookup/JdbcLookupProcessor.java).
    FIRST_ONLY collapses the dim to one row per key (deterministic via
    order_by); SPLIT keeps 1:N multiplicity
    (basic-lib/.../processor/common/MultipleValuesBehavior.java)."""
    keys = [on] if isinstance(on, str) else list(on)
    if multiple == "FIRST_ONLY":
        order = [F.col(order_by)] if order_by else [F.col(c) for c in dim.columns]
        others = [c for c in dim.columns if c not in keys]
        dim = (
            dim.groupBy(*keys)
            .agg(F.min_by(F.struct(*others), F.struct(*order)).alias("_v"))
            .select(*keys, "_v.*")
        )
    return df.join(F.broadcast(dim), on=keys, how=how)


def range_lookup(
    df: DataFrame,
    ranges: DataFrame,
    value_column: str,
    lo_column: str,
    hi_column: str,
    how: str = "left",
) -> DataFrame:
    """Range-interval lookup (value BETWEEN lo AND hi) — the scalable shape
    of the Geolocation processor (geolocation/GeolocationProcessor.java:
    IP -> CIDR-range -> geo attributes).

    The ranges side is broadcast (dimension-sized, like an mmdb file), so
    the probe is a map-side BroadcastNestedLoop with a range predicate —
    no shuffle of the fact side. For range tables too big to broadcast,
    pre-bucket both sides by a shared prefix (e.g. ip >> 16) and equi-join
    on the bucket before the range filter."""
    cond = (F.col(value_column) >= ranges[lo_column]) & (
        F.col(value_column) <= ranges[hi_column]
    )
    return df.join(F.broadcast(ranges), cond, how)


def fuzzy_field_map(
    expected: Sequence[str], actual: Sequence[str], cutoff: float = 0.6
) -> dict[str, str | None]:
    """Fuzzy-match actual column names onto expected names — the Fuzzy Field
    processor (fuzzy/FuzzyFieldProcessor.java, lib/fuzzy/FuzzyMatch.java).
    Schema-mapping utility (driver-side, runs once per schema, not per row).
    """
    import difflib

    out: dict[str, str | None] = {}
    taken: set[str] = set()
    for exp in expected:
        cands = [a for a in actual if a not in taken]
        match = difflib.get_close_matches(exp, cands, n=1, cutoff=cutoff)
        out[exp] = match[0] if match else None
        if match:
            taken.add(match[0])
    return out


def fuzzy_field_rename(
    df: DataFrame,
    expected: Sequence[str],
    threshold: float = 0.6,
    preserve_unmatched: bool = True,
) -> DataFrame:
    """Fuzzy Field processor, in-place single-candidate mode (fuzzy/
    FuzzyFieldProcessor.java with allCandidates=false, inPlace=true): each
    desired output name claims its best-matching input column at or above
    ``threshold`` (greedy, first-expected-wins — the reference scores with
    FuzzyMatch.getRatio) and that column is renamed in place.
    ``preserve_unmatched=False`` additionally drops input columns that no
    desired name claimed (preserveUnmatchedFields). Pure driver-side
    schema work — zero plan cost, no shuffle."""
    mapping = fuzzy_field_map(list(expected), df.columns, cutoff=threshold)
    out = df
    for exp, actual in mapping.items():
        if actual and actual != exp:
            out = out.withColumnRenamed(actual, exp)
    if not preserve_unmatched:
        keep = set(expected)
        out = out.select(*[c for c in out.columns if c in keep])
    return out


def ip_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 string -> unsigned-int-as-long
    (GeolocationProcessor.java ipAsIntFromString)."""
    p = F.split(col, r"\.")
    return (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )


def geolocation_lookup(
    df: DataFrame,
    ranges: DataFrame,
    field_configs: Sequence[tuple[str, str, str]],
    lo_column: str = "range_lo",
    hi_column: str = "range_hi",
    missing_action: str = "REPLACE_WITH_NULLS",
) -> tuple[DataFrame, DataFrame | None]:
    """Geolocation processor over a range-dim extract (geolocation/
    GeolocationProcessor.java: IP -> CIDR-range -> geo attributes; the
    mmdb file becomes a (range_lo, range_hi, attr...) table — ranges must
    be disjoint, as CIDR blocks are).

    ``field_configs``: [(input_field, output_field, attr_column)] — the
    reference's GeolocationFieldConfig (inputFieldName, outputFieldName,
    targetType). STRING input fields are parsed as dotted-quad IPv4
    (:func:`ip_to_long`); numeric ones probe as-is. Configs sharing an
    input field probe the broadcast dim ONCE.

    ``missing_action`` — GeolocationMissingAddressAction: REPLACE_WITH_NULLS
    / IGNORE leave the outputs null (left join); TO_ERROR returns the
    unmatched rows on the second frame (the stage error lane)."""
    by_input: dict[str, list[tuple[str, str]]] = {}
    for inp, outp, attr in field_configs:
        by_input.setdefault(inp, []).append((outp, attr))
    out = df.withColumn("__geo_miss", F.lit(False))
    for i, (inp, outs) in enumerate(by_input.items()):
        probe = (
            ip_to_long(F.col(inp))
            if dict(out.dtypes).get(inp) == "string"
            else F.col(inp).cast("long")
        )
        attrs = sorted({attr for _, attr in outs})
        lo, hi = f"__geo_lo_{i}", f"__geo_hi_{i}"
        dim = F.broadcast(
            ranges.select(
                F.col(lo_column).alias(lo),
                F.col(hi_column).alias(hi),
                *[F.col(a).alias(f"__geo_{i}_{a}") for a in attrs],
            )
        )
        out = out.join(
            dim, (probe >= F.col(lo)) & (probe <= F.col(hi)), "left"
        )
        for outp, attr in outs:
            out = out.withColumn(outp, F.col(f"__geo_{i}_{attr}"))
        # fold this probe's miss into the flag BEFORE its range columns
        # drop out of scope
        out = out.withColumn(
            "__geo_miss",
            F.col("__geo_miss")
            | (F.col(inp).isNotNull() & F.col(lo).isNull()),
        ).drop(lo, hi, *[f"__geo_{i}_{a}" for a in attrs])
    if missing_action.upper() == "TO_ERROR":
        ok = out.where(~F.col("__geo_miss")).drop("__geo_miss")
        err = out.where(F.col("__geo_miss")).drop("__geo_miss")
        return ok, err
    return out.drop("__geo_miss"), None


# ------------------------------------------------------------ dedup stage
def record_deduplicator(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    order_column: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(unique, duplicate) split by hash of selected fields — the Record
    Deduplicator (basic-lib/.../dedup/DeDupProcessor.java:122-143). Batch
    form; the streaming form is dropDuplicatesWithinWatermark.

    Winner per group = the row minimizing (order_column if given, then every
    remaining column): a fixed-width HashAggregate (map-side combined, no
    sort), and DETERMINISTIC across partition layouts — the previous
    window-over-monotonically_increasing_id plan both paid a full
    shuffle+sort and picked a layout-dependent winner. The duplicate lane is
    ``exceptAll`` (multiplicity-aware: N byte-identical copies yield 1
    unique + N-1 duplicates, which a plain anti-join cannot express)."""
    cols = list(columns) if columns else list(df.columns)
    rest = [c for c in df.columns if c not in cols]
    if order_column and order_column in rest:
        rest = [order_column] + [c for c in rest if c != order_column]
    if rest:
        winners = (
            df.groupBy(*cols)
            .agg(F.min(F.struct(*[F.col(c) for c in rest])).alias("_rep"))
            .select(*cols, *[F.col(f"_rep.{c}").alias(c) for c in rest])
            .select(*df.columns)  # original column order
        )
    else:
        winners = df.dropDuplicates(cols)
    return winners, df.exceptAll(winners)


# ----------------------------------------------------- scripting (pandas)
def scripting_processor(
    df: DataFrame,
    func: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """Arbitrary per-batch user code over Arrow batches — the vectorized
    replacement for the JavaScript/Jython/Groovy scripting processors
    (commonlib/.../scripting/AbstractScriptingProcessor.java:207-253). The
    user function sees a pandas DataFrame per partition chunk ('records' in
    the reference's binding), never a Python loop per row."""
    out_schema = schema or df.schema

    def run(batches):
        for pdf in batches:
            yield func(pdf)

    return df.mapInPandas(run, out_schema)


# ----------------------------------------------------- spark evaluator
def spark_evaluator(
    df: DataFrame,
    transformer: Callable,
    init_params: dict | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Spark Evaluator (spark-processor-protolib/.../spark/
    SparkProcessor.java): a user-supplied transformer runs over each batch.
    The reference instantiates a ``SparkTransformer`` class — ``init(params)``
    then ``transform(records) -> TransformResult(result, errors)`` — and
    round-trips records through an RDD. Here the engine IS Spark, so the
    transformer is simply a callable ``DataFrame -> DataFrame`` (or
    ``-> (result_df, errors_df)`` for the TransformResult error lane) over
    the live lane — no serialization boundary, full Catalyst optimization
    across the user code's plan.

    ``init_params`` mirrors the reference's preprocessMethodArgs: passed as
    keyword args when the callable accepts them.
    """
    if init_params:
        out = transformer(df, **init_params)
    else:
        out = transformer(df)
    if isinstance(out, tuple):
        result, errors = out
        return result, errors
    return out, None


# ------------------------------------------------- external-I/O archetypes
def http_client_processor(
    df: DataFrame,
    url_column: str,
    response_column: str = "http_response",
    transport: Callable[[list[str]], list[str]] | None = None,
    batch_size: int = 100,
) -> DataFrame:
    """HTTP Client processor archetype (basic-lib/.../processor/http/
    HttpProcessor.java): per-record GET enriching the record with the
    response body.

    Scale shape: the calls run inside mapInPandas — one Arrow batch at a
    time per partition, so concurrency = partitions and the in-flight
    request count is bounded by ``batch_size`` (the reference's
    maxRequestCompletionSecs/parallelism analog). ``transport`` takes a
    list of URLs and returns a list of response bodies; inject a real
    client (requests.Session with retries) in production — this sandbox
    has no network, so the default transport raises with a clear message.
    Injectability keeps the operator fully testable offline.
    """

    def default_transport(urls: list[str]) -> list[str]:
        raise RuntimeError(
            "http_client_processor needs a transport (no network in this "
            "environment); inject transport=lambda urls: [...]"
        )

    fn = transport or default_transport
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(response_column, T.StringType(), True)]
    )

    def run(batches):
        for pdf in batches:
            out = pdf.copy()
            responses: list[str] = []
            urls = pdf[url_column].tolist()
            for i in range(0, len(urls), batch_size):
                responses.extend(fn(urls[i : i + batch_size]))
            out[response_column] = responses
            yield out

    return df.mapInPandas(run, out_schema)


def jdbc_tee(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
):
    """JDBC Tee archetype (jdbc-lib/.../processor/jdbctee/JdbcTeeDProcessor
    .java): write the batch to a database table AND pass it through.

    Returns (passthrough_df, configured_writer); the caller invokes
    ``writer.save()`` where a JDBC driver exists (foreachBatch in
    streaming). Returning the writer rather than saving keeps the tee
    option-wiring testable without a database, like sources/jdbc.py."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    return df, writer


def elasticsearch_sink(
    df: DataFrame,
    index: str,
    transport: Callable[[str], dict] | None = None,
    id_column: str | None = None,
    op: str = "index",
    batch_size: int = 500,
) -> DataFrame:
    """Elasticsearch destination archetype (elasticsearch-protolib/.../
    ElasticSearchDTarget.java): documents posted to the _bulk API as
    action+source NDJSON pairs, ``id_column`` -> _id (the reference's
    document-ID expression), ``op`` = index | create | update | delete
    (its default-operation config).

    Scale shape: runs inside mapInPandas — one Arrow batch per partition,
    chunked to ``batch_size`` docs per _bulk call (the reference's
    batch-size knob); concurrency = partitions, exactly how es-hadoop
    parallelizes. ``transport`` takes the NDJSON body and returns the
    parsed _bulk response dict; inject a real client
    (requests.post(es/_bulk)) in production — this sandbox has no network,
    so the default raises with a clear message. Returns one row per Arrow
    batch with (docs_indexed, errors) — the sink's per-batch meters."""

    def default_transport(body: str) -> dict:
        raise RuntimeError(
            "elasticsearch_sink needs a transport (no network in this "
            "environment); inject transport=lambda ndjson_body: {...}"
        )

    fn = transport or default_transport
    cols = df.columns

    def run(batches):
        import json as _json

        for pdf in batches:
            total, errors = 0, 0
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                lines: list[str] = []
                for rec in chunk.to_dict("records"):
                    action: dict = {"_index": index}
                    if id_column is not None:
                        action["_id"] = rec[id_column]
                    lines.append(_json.dumps({op: action}))
                    if op != "delete":
                        lines.append(_json.dumps(rec, default=str))
                resp = fn("\n".join(lines) + "\n")
                items = resp.get("items", [])
                total += len(items)
                errors += sum(
                    1
                    for it in items
                    if next(iter(it.values())).get("status", 200) >= 300
                )
            yield pd.DataFrame({"docs_indexed": [total], "errors": [errors]})

    return df.select(*cols).mapInPandas(run, "docs_indexed long, errors long")


def solr_sink(
    df: DataFrame,
    solr_uri: str,
    collection: str,
    field_map: dict[str, str],
    indexing_mode: str = "BATCH",
    batch_size: int = 500,
    transport: Callable[[str, bytes], dict] | None = None,
) -> DataFrame:
    """Solr destination (solr-protolib/.../destination/solr/SolrTarget.java):
    ``field_map`` = {dataframe column -> solr field} (the reference's
    fieldNamesMap, SolrTarget.java:129-135; a mapped column missing from the
    DataFrame fails validation up front — the columnar form of SOLR_06),
    ``indexing_mode`` RECORD (commit per add) | BATCH (adds then one commit,
    SolrTarget.java:137-162). Wire: the public Solr JSON update API —
    POST ``<uri>/<collection>/update`` with a JSON doc array, commit via the
    ``commit=true`` query param; the default transport is a real urllib
    POST, tests run a live loopback fake.

    Runs in mapInPandas — concurrency = partitions, docs chunked to
    ``batch_size`` per update call. Returns per-Arrow-batch meters
    (docs_indexed, updates_sent)."""
    missing = [c for c in field_map if c not in df.columns]
    if missing:
        raise ValueError(f"SOLR_06: mapped fields absent from frame: {missing}")
    if indexing_mode not in ("BATCH", "RECORD"):
        raise ValueError(f"SOLR: unknown indexing mode '{indexing_mode}'")

    def default_transport(url: str, body: bytes) -> dict:
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            return _json.loads(resp.read() or b"{}")

    fn = transport or default_transport
    cols = list(field_map)

    def run(batches):
        import json as _json

        base = f"{solr_uri.rstrip('/')}/{collection}/update"
        for pdf in batches:
            sent, calls = 0, 0
            n = len(pdf)
            for start in range(0, n, batch_size):
                chunk = pdf[cols].iloc[start : start + batch_size]
                docs = [
                    {
                        field_map[c]: v
                        for c, v in rec.items()
                        if v is not None and v == v  # skip null/NaN
                    }
                    for rec in chunk.to_dict("records")
                ]
                # RECORD commits every update; BATCH commits on the last one
                commit = indexing_mode == "RECORD" or start + batch_size >= n
                url = base + ("?commit=true" if commit else "")
                fn(url, _json.dumps(docs, default=str).encode("utf-8"))
                sent += len(docs)
                calls += 1
            yield pd.DataFrame({"docs_indexed": [sent], "updates_sent": [calls]})

    return df.select(*cols).mapInPandas(run, "docs_indexed long, updates_sent long")
