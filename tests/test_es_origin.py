"""Elasticsearch sliced-scroll origin against a live loopback fake
(tests/esfake.py): slice-parallel drain, scroll pagination + cursor
delete, basic auth, incremental ${offset} resume, and the
ElasticsearchDSource config port."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datacollector_spark.sources.elasticsearch import (
    EsScrollConfig,
    es_scroll_batch,
    es_scroll_offsets,
)

from tests.esfake import FakeEs

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("body", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _docs(n, start=0):
    return [
        (f"d{i}", {"doc_id": i, "body": f"text {i}", "seq": i})
        for i in range(start, start + n)
    ]


def test_sliced_drain_exactly_once(spark):
    fake = FakeEs(_docs(97))
    fake.start()
    try:
        cfg = EsScrollConfig(
            f"http://127.0.0.1:{fake.port}",
            "transcripts",
            num_slices=4,
            max_batch_size=10,
        )
        df = es_scroll_batch(spark, cfg, SCHEMA)
        rows = df.collect()
        assert sorted(r["doc_id"] for r in rows) == list(range(97))
        # every row tagged with its slice; all four slices participated
        assert {r["_slice"] for r in rows} == {0, 1, 2, 3}
        # each slice sent its own sliced search with size + slice body
        assert len(fake.searches) == 4
        assert {s["slice"]["id"] for s in fake.searches} == {0, 1, 2, 3}
        assert all(
            s["size"] == 10 and s["slice"]["max"] == 4 for s in fake.searches
        )
        # every cursor was deleted at end of drain (deleteCursor default)
        assert sorted(fake.deleted) == sorted(
            f"scroll-{i}" for i in range(4)
        )
        assert not fake.scrolls
    finally:
        fake.stop()


def test_single_slice_omits_slice_body(spark):
    fake = FakeEs(_docs(5))
    fake.start()
    try:
        cfg = EsScrollConfig(
            f"http://127.0.0.1:{fake.port}", "idx", num_slices=1
        )
        assert es_scroll_batch(spark, cfg, SCHEMA).count() == 5
        assert "slice" not in fake.searches[0]
    finally:
        fake.stop()


def test_basic_auth(spark):
    fake = FakeEs(_docs(3), require_auth=("elastic", "sekret"))
    fake.start()
    try:
        cfg = EsScrollConfig(
            f"http://127.0.0.1:{fake.port}",
            "idx",
            username="elastic",
            password="sekret",
        )
        assert es_scroll_batch(spark, cfg, SCHEMA).count() == 3
        bad = EsScrollConfig(f"http://127.0.0.1:{fake.port}", "idx")
        with pytest.raises(Exception, match="401|Unauthorized|PYTHON"):
            es_scroll_batch(spark, bad, SCHEMA).count()
    finally:
        fake.stop()


def test_incremental_offset_resume(spark):
    fake = FakeEs(_docs(20))
    fake.start()
    try:
        query = '{"query": {"range": {"seq": {"gt": ${offset}}}}}'
        cfg = EsScrollConfig(
            f"http://127.0.0.1:{fake.port}",
            "idx",
            query=query,
            num_slices=2,
            incremental=True,
            offset_field="seq",
            initial_offset="-1",
        )
        df = es_scroll_batch(spark, cfg, SCHEMA).persist()
        assert sorted(r["doc_id"] for r in df.collect()) == list(range(20))
        offs = es_scroll_offsets(df, "seq")
        assert set(offs) == {"0", "1"}
        # each slice's offset is the max seq WITHIN that slice (hash split)
        assert "19" in offs.values() or "18" in offs.values()
        df.unpersist()
        # new docs arrive; resume drains ONLY them
        fake.docs.extend(_docs(7, start=20))
        df2 = es_scroll_batch(spark, cfg, SCHEMA, last_offsets=offs)
        got = sorted(r["doc_id"] for r in df2.collect())
        assert got == list(range(20, 27))
        # a slice that saw NO new rows keeps its previous offset (it is
        # absent from the drained groupBy - carry-over, not loss)
        empty = es_scroll_batch(spark, cfg, SCHEMA, last_offsets=offs)
        offs2 = es_scroll_offsets(empty.limit(0), "seq", cfg=cfg, previous=offs)
        assert offs2 == offs
        # a slice-count change with stored offsets refuses (ELASTICSEARCH_26)
        cfg4 = EsScrollConfig(
            f"http://127.0.0.1:{fake.port}",
            "idx",
            query=query,
            num_slices=4,
            incremental=True,
        )
        with pytest.raises(ValueError, match="ELASTICSEARCH_26"):
            es_scroll_batch(spark, cfg4, SCHEMA, last_offsets=offs)
        # incremental without ${offset} in the query refuses (…_25)
        with pytest.raises(ValueError, match="ELASTICSEARCH_25"):
            es_scroll_batch(
                spark,
                EsScrollConfig(
                    f"http://127.0.0.1:{fake.port}",
                    "idx",
                    incremental=True,
                ),
                SCHEMA,
            )
    finally:
        fake.stop()


def test_es_config_port(spark):
    from datacollector_spark.plans.spec import PipelineSpec, ValidationError

    fake = FakeEs(_docs(30))
    fake.start()
    try:
        config = {
            "pipelineConfig": {
                "title": "es scroll",
                "stages": [
                    {
                        "instanceName": "ES_01",
                        "stageName": (
                            "com_streamsets_pipeline_stage_origin_"
                            "elasticsearch_ElasticsearchDSource"
                        ),
                        "outputLanes": ["lane1"],
                        "configuration": [
                            {
                                "name": "conf.httpUris",
                                "value": [f"127.0.0.1:{fake.port}"],
                            },
                            {"name": "conf.index", "value": "transcripts"},
                            {"name": "conf.numSlices", "value": 3},
                            {"name": "conf.maxBatchSize", "value": 8},
                        ],
                    },
                    {
                        "instanceName": "Expression_01",
                        "stageName": (
                            "com_streamsets_pipeline_stage_processor_"
                            "expression_ExpressionDProcessor"
                        ),
                        "inputLanes": ["lane1"],
                        "outputLanes": ["lane2"],
                        "configuration": [
                            {
                                "name": "expressionProcessorConfigs",
                                "value": [
                                    {
                                        "fieldToSet": "/double_seq",
                                        "expression": (
                                            "${record:value('/seq') * 2}"
                                        ),
                                    }
                                ],
                            }
                        ],
                    },
                    {
                        "instanceName": "Trash_01",
                        "stageName": (
                            "com_streamsets_pipeline_stage_destination_"
                            "devnull_NullDTarget"
                        ),
                        "inputLanes": ["lane2"],
                        "configuration": [],
                    },
                ],
            }
        }
        with pytest.raises(ValidationError, match="record_schema"):
            PipelineSpec.from_sdc_config(config)
        spec = PipelineSpec.from_sdc_config(
            config, origin_overrides={"ES_01": {"record_schema": SCHEMA}}
        )
        lanes = spec.build(spark)
        rows = lanes["lane2"].collect()
        assert sorted(r["doc_id"] for r in rows) == list(range(30))
        assert all(r["double_seq"] == r["seq"] * 2 for r in rows)
        # the ported origin ran 3 slices
        assert {s["slice"]["id"] for s in fake.searches} == {0, 1, 2}
    finally:
        fake.stop()
