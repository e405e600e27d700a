"""Pipeline spec: a declarative JSON-able pipeline config -> DataFrame DAG.

The reference's "query" is a pipeline-config JSON that goes through
validation (validation/PipelineConfigurationValidator.java:69 — DAG
well-formedness, lane consistency, config constraints), bean creation
(creation/PipelineBeanCreator.java:59), and physical wiring into a pipe
graph (runner/Pipeline.java:366-). This module is the same lifecycle on
Spark: spec dict -> validate() -> build(spark) returns the terminal
DataFrames per output lane; Catalyst is the physical planner.

Spec shape::

    {
      "pipeline": "my-pipe",
      "stages": [
        {"name": "src",  "type": "parquet_origin", "path": ..., "out": "main"},
        {"name": "sel",  "type": "stream_selector", "in": "main",
         "conditions": [["errors", "event_type = 'error'"]],
         "default_lane": "ok"},
        {"name": "mask", "type": "field_masker", "in": "ok",
         "columns": ["text"], "mask_type": "VARIABLE_LENGTH", "out": "masked"},
        {"name": "sink", "type": "memory_target", "in": "masked"}
      ]
    }

Each stage consumes a named lane (``in``) and produces one (``out``) or many
(selector lanes). Unconnected lanes, duplicate producers, unknown stage
types, and missing configs are validation errors, mirroring the reference's
validation issue codes.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from datacollector_spark.operators import processors as P


class ValidationError(ValueError):
    pass


# stage type -> (builder, required config keys)
def _origin(spark, cfg, _lanes):
    reader = spark.read
    if "schema" in cfg:
        reader = reader.schema(cfg["schema"])
    fmt = cfg.get("format", "parquet")
    return reader.format(fmt).load(cfg["path"])


_PROCESSORS: dict[str, tuple[Any, list[str]]] = {
    "field_masker": (P.field_masker, ["columns"]),
    "field_hasher": (P.field_hasher, ["columns", "target"]),
    "field_remover": (P.field_remover, ["columns"]),
    "field_renamer": (P.field_renamer, ["renames"]),
    "field_splitter": (P.field_splitter, ["column", "separator", "to"]),
    "field_type_converter": (P.field_type_converter, ["conversions"]),
    "value_replacer": (P.value_replacer, []),
    "expression_evaluator": (P.expression_evaluator, ["expressions"]),
    "json_parser": (P.json_parser, ["column", "schema", "into"]),
    "log_parser": (P.log_parser, ["column", "pattern", "groups"]),
    "base64_codec": (P.base64_codec, ["column", "into"]),
    "static_lookup": (P.static_lookup, ["mapping", "key_column", "value_column"]),
    "list_pivot": (P.list_pivot, ["column"]),
    "field_zip": (P.field_zip, ["into", "left", "right"]),
    "field_merger": (P.field_merger, ["into", "columns"]),
    "field_flattener": (P.field_flattener, ["column"]),
}


class PipelineSpec:
    def __init__(self, spec: dict):
        self.spec = spec
        self.validate()

    # ------------------------------------------------------------ validate
    def validate(self) -> None:
        """DAG well-formedness + config constraints (the reference's
        PipelineConfigurationValidator pass)."""
        stages = self.spec.get("stages")
        if not stages:
            raise ValidationError("VALIDATION_0001: pipeline has no stages")
        producers: dict[str, str] = {}
        names = set()
        for st in stages:
            name = st.get("name")
            if not name or name in names:
                raise ValidationError(f"VALIDATION_0002: missing/duplicate stage name {name!r}")
            names.add(name)
            typ = st.get("type")
            # lanes are wired topologically: a consumed lane must already
            # have a producer earlier in the stage list
            lane = st.get("in")
            if lane and lane not in producers:
                raise ValidationError(
                    f"VALIDATION_0005: stage {name!r} consumes unproduced lane {lane!r}"
                )
            if typ == "parquet_origin":
                if "path" not in st:
                    raise ValidationError(f"VALIDATION_0003: {name}: origin needs 'path'")
                out = st.get("out", "main")
                if out in producers:
                    raise ValidationError(f"VALIDATION_0004: lane {out!r} produced twice")
                producers[out] = name
            elif typ == "stream_selector":
                if "conditions" not in st:
                    raise ValidationError(f"VALIDATION_0003: {name}: selector needs 'conditions'")
                for lane, _ in st["conditions"]:
                    if lane in producers:
                        raise ValidationError(f"VALIDATION_0004: lane {lane!r} produced twice")
                    producers[lane] = name
                producers[st.get("default_lane", "default")] = name
            elif typ == "precondition_filter":
                producers[st.get("out", "ok")] = name
                producers[st.get("error_lane", "errors")] = name
            elif typ in _PROCESSORS:
                _, req = _PROCESSORS[typ]
                for key in req:
                    if key not in st:
                        raise ValidationError(
                            f"VALIDATION_0003: {name}: {typ} needs {key!r}"
                        )
                producers[st.get("out", st.get("in", "main"))] = name
            elif typ == "memory_target":
                pass
            else:
                raise ValidationError(f"VALIDATION_0006: unknown stage type {typ!r}")

    # --------------------------------------------------------------- build
    def build(
        self,
        spark: SparkSession,
        overrides: dict[str, Any] | None = None,
    ) -> dict[str, DataFrame]:
        """Wire the stages; returns {lane: DataFrame} for every lane.

        ``overrides`` — {lane: DataFrame | list[row dict]}: inject literal
        stage OUTPUTS mid-DAG; downstream stages consume the injected frame
        instead of the computed one (the reference preview's stagesOverride,
        container/.../runner/preview/sync/SyncPreviewer.java:196 — test a
        downstream stage in isolation from its real upstream). The computed
        lane is still returned under '<lane>:computed' so a preview shows
        both what the stage produced and what downstream consumed."""
        overrides = overrides or {}

        def _place(lane: str, df: DataFrame) -> None:
            if lane in overrides:
                ov = overrides[lane]
                if not isinstance(ov, DataFrame):
                    ov = spark.createDataFrame(ov, schema=df.schema)
                lanes[f"{lane}:computed"] = df
                lanes[lane] = ov
            else:
                lanes[lane] = df

        lanes: dict[str, DataFrame] = {}
        targets: dict[str, DataFrame] = {}
        for st in self.spec["stages"]:
            typ = st["type"]
            cfg = {k: v for k, v in st.items() if k not in ("name", "type", "in", "out")}
            if typ == "parquet_origin":
                _place(st.get("out", "main"), _origin(spark, cfg, lanes))
            elif typ == "stream_selector":
                routed = P.stream_selector(
                    lanes[st["in"]],
                    [tuple(c) for c in st["conditions"]],
                    st.get("default_lane", "default"),
                )
                for lane, df in routed.items():
                    _place(lane, df)
            elif typ == "precondition_filter":
                ok, err = P.precondition_filter(
                    lanes[st["in"]],
                    st.get("condition", ""),
                    st.get("required_fields", ()),
                )
                _place(st.get("out", "ok"), ok)
                _place(st.get("error_lane", "errors"), err)
            elif typ in _PROCESSORS:
                fn, _ = _PROCESSORS[typ]
                _place(st.get("out", st["in"]), fn(lanes[st["in"]], **cfg))
            elif typ == "memory_target":
                targets[st["name"]] = lanes[st["in"]]
        lanes.update(targets)
        return lanes

    # ------------------------------------------------- SDC config porting
    @classmethod
    def from_sdc_config(
        cls,
        pipeline_config: dict,
        origin_overrides: dict[str, dict] | None = None,
    ) -> "PipelineSpec":
        """Port a stock SDC pipeline-config JSON (the reference's export
        format: ``stages[]`` with ``instanceName``/``stageName``/
        ``configuration``/``inputLanes``/``outputLanes`` —
        container/.../config/PipelineConfiguration.java) into a
        PipelineSpec, translating every EL expression through
        :func:`~datacollector_spark.functions.el.el_to_sql`.

        Supported stage classes (the stock selector+evaluator pipelines):
          * ``*SelectorDProcessor`` — ``lanePredicates`` [{outputLane,
            predicate}] where the last predicate is the literal "default"
            (SelectorProcessor.java:66-67,92-110)
          * ``*ExpressionDProcessor`` — ``expressionProcessorConfigs``
            [{fieldToSet, expression}] (ExpressionProcessorConfig.java:41,54)
          * ``*FieldRemoverDProcessor`` — ``fields`` + ``filterOperation``
            REMOVE/KEEP
          * ``*DSource`` (any origin) — replaced by a parquet origin; the
            caller supplies {instanceName: {"path": ..., "format": ...}}
            via ``origin_overrides`` (sandbox origins read files, not the
            jar-bound external system)
          * ``*DTarget`` / ``*Trash*`` — memory_target (collect lane)

        SDC lane names (``Selector_01OutputLane1``) are kept verbatim, so
        ported previews read like the original pipeline. Fan-in (multiple
        inputLanes) is not supported here — use the framework combiner.
        """
        from datacollector_spark.functions.el import el_to_sql, path_to_column

        cfg = pipeline_config.get("pipelineConfig", pipeline_config)
        origin_overrides = origin_overrides or {}
        stages: list[dict] = []
        for st in cfg["stages"]:
            name = st["instanceName"]
            klass = st.get("stageName", "")
            conf = {c["name"]: c.get("value") for c in st.get("configuration", [])}
            ins, outs = st.get("inputLanes", []), st.get("outputLanes", [])
            if len(ins) > 1:
                raise ValidationError(
                    f"VALIDATION_0007: {name}: fan-in ports via the framework "
                    "combiner, not from_sdc_config"
                )
            if "SelectorDProcessor" in klass:
                preds = conf.get("lanePredicates") or []
                if not preds or preds[-1].get("predicate") != "default":
                    raise ValidationError(
                        f"VALIDATION_0003: {name}: selector needs lanePredicates "
                        "ending with the 'default' predicate (SELECTOR_07)"
                    )
                stages.append(
                    {
                        "name": name,
                        "type": "stream_selector",
                        "in": ins[0],
                        "conditions": [
                            [p["outputLane"], el_to_sql(p["predicate"])]
                            for p in preds[:-1]
                        ],
                        "default_lane": preds[-1]["outputLane"],
                    }
                )
            elif "ExpressionDProcessor" in klass:
                stages.append(
                    {
                        "name": name,
                        "type": "expression_evaluator",
                        "in": ins[0],
                        "out": outs[0],
                        "expressions": {
                            path_to_column(e["fieldToSet"]): el_to_sql(e["expression"])
                            for e in conf.get("expressionProcessorConfigs", [])
                        },
                    }
                )
            elif "FieldRenamerDProcessor" in klass:
                stages.append(
                    {
                        "name": name,
                        "type": "field_renamer",
                        "in": ins[0],
                        "out": outs[0],
                        "renames": {
                            path_to_column(r["fromFieldExpression"]):
                                path_to_column(r["toFieldExpression"])
                            for r in conf.get("renameMapping", [])
                        },
                    }
                )
            elif "FieldTypeConverterDProcessor" in klass:
                # FieldTypeConverterConfig.java:41-49 {fields, targetType};
                # SDC Field.Type -> Spark SQL type. Exported configs carry
                # dozens of defaulted keys we deliberately ignore — but
                # wholeTypeConverterConfigs CHANGES semantics (convert-all-
                # of-type mode), so its presence must fail loudly.
                if conf.get("wholeTypeConverterConfigs"):
                    raise ValidationError(
                        f"VALIDATION_0003: {name}: whole-type conversion mode "
                        "is not ported — list fields explicitly"
                    )
                type_map = {
                    "BOOLEAN": "boolean", "BYTE": "tinyint", "SHORT": "smallint",
                    "INTEGER": "int", "LONG": "bigint", "FLOAT": "float",
                    "DOUBLE": "double", "DECIMAL": "decimal(38,9)",
                    "STRING": "string", "DATE": "date", "DATETIME": "timestamp",
                }
                conversions: dict[str, str] = {}
                for c in conf.get("fieldTypeConverterConfigs", []):
                    tt = (c.get("targetType") or "").upper()
                    if tt not in type_map:
                        raise ValidationError(
                            f"VALIDATION_0003: {name}: unsupported targetType {tt!r}"
                        )
                    target = type_map[tt]
                    if tt == "DATETIME" and c.get("otherDateFormat"):
                        target = f"timestamp:{c['otherDateFormat']}"
                    for fld in c.get("fields", []):
                        conversions[path_to_column(fld)] = target
                stages.append(
                    {
                        "name": name,
                        "type": "field_type_converter",
                        "in": ins[0],
                        "out": outs[0],
                        "conversions": conversions,
                    }
                )
            elif "FieldHasherDProcessor" in klass:
                # FieldHasherConfig.java:38-49: each source field is hashed
                # IN PLACE — one field_hasher stage per field, chained on
                # synthetic lanes
                algo_map = {"MD5": "md5", "SHA1": "sha1", "SHA2": "sha256"}
                hash_cfgs = conf.get("fieldHasherConfigs", [])
                lane_in = ins[0]
                flat: list[tuple[str, str]] = [
                    (fld, algo_map.get((hc.get("hashType") or "SHA2").upper(), "sha256"))
                    for hc in hash_cfgs
                    for fld in hc.get("sourceFieldsToHash", [])
                ]
                for i, (fld, algo) in enumerate(flat):
                    last = i == len(flat) - 1
                    lane_out = outs[0] if last else f"{name}#lane{i}"
                    col = path_to_column(fld)
                    stages.append(
                        {
                            "name": f"{name}#{i}" if not last else name,
                            "type": "field_hasher",
                            "in": lane_in,
                            "out": lane_out,
                            "columns": [col],
                            "target": col,
                            "algo": algo,
                        }
                    )
                    lane_in = lane_out
            elif "FieldRemoverDProcessor" in klass:
                cols = [path_to_column(p) for p in conf.get("fields", [])]
                op = (conf.get("filterOperation") or "REMOVE").upper()
                stages.append(
                    {
                        "name": name,
                        "type": "field_remover",
                        "in": ins[0],
                        "out": outs[0],
                        "columns": cols,
                        "keep": op == "KEEP",
                    }
                )
            elif "DSource" in klass:
                ov = origin_overrides.get(name)
                if ov is None:
                    raise ValidationError(
                        f"VALIDATION_0008: {name}: origin {klass!r} needs an "
                        "origin_overrides entry with a local 'path'"
                    )
                stages.append(
                    {"name": name, "type": "parquet_origin", "out": outs[0], **ov}
                )
            elif "DTarget" in klass or "Trash" in klass:
                stages.append({"name": name, "type": "memory_target", "in": ins[0]})
            else:
                raise ValidationError(
                    f"VALIDATION_0006: unsupported SDC stage class {klass!r}"
                )
        return cls({"pipeline": cfg.get("title", "ported"), "stages": stages})

    # ------------------------------------------------------------- preview
    def preview(
        self,
        spark: SparkSession,
        limit_rows: int = 10,
        overrides: dict[str, Any] | None = None,
    ) -> dict[str, list[dict]]:
        """Dry-run: build the DAG, capture up to ``limit_rows`` rows from
        EVERY lane, commit nothing (the reference's preview runner,
        container/.../runner/preview/sync/SyncPreviewer.java:73,196 —
        limited-batch run with per-stage output capture and no offset
        commit). Sinks are never written; origins are read through the
        normal scan path, so preview exercises the real plan. ``overrides``
        injects literal stage outputs mid-DAG (see :meth:`build`)."""
        lanes = self.build(spark, overrides=overrides)
        return {
            lane: [r.asDict(recursive=True) for r in df.limit(limit_rows).collect()]
            for lane, df in lanes.items()
        }
