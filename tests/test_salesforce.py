"""Salesforce Bulk-API origin against a live loopback fake
(tests/sffake.py): SOAP login (incl. INVALID_LOGIN fault), job/batch XML
lifecycle with session-header enforcement, PK chunking into parallel
executor-fetched result batches, ${offset} incremental resume, and the
empty-result sentinel."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datacollector_spark.sources.salesforce import (
    BulkClient,
    ForceConfig,
    ForceError,
    force_bulk_query,
    force_next_offset,
    soap_login,
)
from tests.sffake import FakeSalesforce

SCHEMA = T.StructType(
    [
        T.StructField("Id", T.StringType()),
        T.StructField("Name", T.StringType()),
        T.StructField("Amount", T.DoubleType()),
    ]
)


def _rows(n, start=0):
    return [
        {"Id": f"001{i:012d}", "Name": f"acct {i}", "Amount": i * 1.5}
        for i in range(start, start + n)
    ]


@pytest.fixture()
def fake():
    f = FakeSalesforce(_rows(57))
    f.start()
    yield f
    f.stop()


def _cfg(fake, **kw) -> ForceConfig:
    return ForceConfig(
        login_url=f"http://127.0.0.1:{fake.port}",
        username=fake.username,
        password=fake.password,
        soql_query="SELECT Id,Name,Amount FROM Account "
        "WHERE Id > '${offset}' ORDER BY Id",
        **kw,
    )


def test_soap_login_and_fault(fake):
    sid, host = soap_login(
        f"http://127.0.0.1:{fake.port}", fake.username, fake.password
    )
    assert sid == fake.session_id
    assert host == f"http://127.0.0.1:{fake.port}"
    with pytest.raises(ForceError, match="INVALID_LOGIN"):
        soap_login(f"http://127.0.0.1:{fake.port}", fake.username, "wrong")


def test_session_header_enforced(fake):
    bad = BulkClient(f"http://127.0.0.1:{fake.port}", "WRONG-SESSION")
    with pytest.raises(Exception, match="401"):
        bad.create_query_job("Account")


def test_bulk_query_single_batch(spark, fake):
    df = force_bulk_query(spark, _cfg(fake), SCHEMA)
    rows = df.collect()
    assert len(rows) == 57
    assert sorted(r["Id"] for r in rows) == [r["Id"] for r in _rows(57)]
    assert {r["Name"] for r in rows} == {f"acct {i}" for i in range(57)}
    assert rows[0]["Amount"] is None or isinstance(rows[0]["Amount"], float)
    # the job was closed
    assert all(j["state"] == "Closed" for j in fake.jobs.values())


def test_pk_chunking_parallel_fetch(spark, fake):
    df = force_bulk_query(spark, _cfg(fake, pk_chunk_size=10), SCHEMA)
    assert df.count() == 57
    # ceil(57/10) = 6 chunk batches, each fetched exactly once, plus the
    # NotProcessed original which is never fetched
    job = list(fake.jobs.values())[0]
    states = [b["state"] for b in job["batches"].values()]
    assert states.count("NotProcessed") == 1
    assert states.count("Completed") == 6
    assert len(fake.result_fetches) == 6
    assert len({b for b, _ in fake.result_fetches}) == 6


def test_incremental_offset_resume(spark, fake):
    cfg = _cfg(fake)
    df = force_bulk_query(spark, cfg, SCHEMA)
    off = force_next_offset(df, "Id")
    assert off == _rows(57)[-1]["Id"]
    fake.rows.extend(_rows(5, start=57))
    df2 = force_bulk_query(spark, cfg, SCHEMA, last_offset=off)
    got = sorted(r["Id"] for r in df2.collect())
    assert got == [r["Id"] for r in _rows(5, start=57)]


def test_empty_result_sentinel(spark, fake):
    cfg = _cfg(fake)
    last = _rows(57)[-1]["Id"]
    df = force_bulk_query(spark, cfg, SCHEMA, last_offset=last)
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_force_config_port(spark, fake):
    from datacollector_spark.plans.spec import PipelineSpec, ValidationError

    config = {
        "pipelineConfig": {
            "title": "sfdc",
            "stages": [
                {
                    "instanceName": "Salesforce_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_origin_salesforce_ForceDSource"
                    ),
                    "outputLanes": ["lane1"],
                    "configuration": [
                        {"name": "forceConfig.username", "value": fake.username},
                        {"name": "forceConfig.password", "value": fake.password},
                        {
                            "name": "forceConfig.authEndpoint",
                            "value": f"127.0.0.1:{fake.port}",
                        },
                        {"name": "forceConfig.useBulkAPI", "value": True},
                        {
                            "name": "forceConfig.soqlQuery",
                            "value": (
                                "SELECT Id,Name,Amount FROM Account "
                                "WHERE Id > '${offset}' ORDER BY Id"
                            ),
                        },
                    ],
                },
                {
                    "instanceName": "Trash_01",
                    "stageName": (
                        "com_streamsets_pipeline_stage_destination_devnull_NullDTarget"
                    ),
                    "inputLanes": ["lane1"],
                    "configuration": [],
                },
            ],
        }
    }
    with pytest.raises(ValidationError, match="record_schema"):
        PipelineSpec.from_sdc_config(config)
    spec = PipelineSpec.from_sdc_config(
        config,
        origin_overrides={
            "Salesforce_01": {
                "record_schema": SCHEMA,
                # https scheme prefix comes from the port; tests need http
                "login_url": f"http://127.0.0.1:{fake.port}",
                "pk_chunk_size": 20,
            }
        },
    )
    lanes = spec.build(spark)
    rows = lanes["lane1"].collect()
    assert len(rows) == 57
    # durable offset recorded for the next incremental run
    assert spec.last_offsets["Salesforce_01"] == _rows(57)[-1]["Id"]
    # SOAP path refuses loudly
    config["pipelineConfig"]["stages"][0]["configuration"][3] = {
        "name": "forceConfig.useBulkAPI",
        "value": False,
    }
    with pytest.raises(ValidationError, match="Bulk API"):
        PipelineSpec.from_sdc_config(
            config, origin_overrides={"Salesforce_01": {"record_schema": SCHEMA}}
        )
