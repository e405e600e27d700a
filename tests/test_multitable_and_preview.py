"""JDBC multitable orchestration (topo-sort, per-table offsets) + pipeline
preview mode."""

from __future__ import annotations

import pytest

from datacollector_spark.sources import jdbc as jdbc_mod
from datacollector_spark.sources.jdbc import jdbc_multitable, topological_table_order


def test_topo_sort_parents_first():
    # orders -> customer -> region; lineitem -> orders, part
    tables = ["lineitem", "orders", "customer", "part", "region"]
    edges = [
        ("orders", "customer"),
        ("customer", "region"),
        ("lineitem", "orders"),
        ("lineitem", "part"),
    ]
    got = topological_table_order(tables, edges)
    assert got.index("region") < got.index("customer") < got.index("orders")
    assert got.index("orders") < got.index("lineitem")
    assert got.index("part") < got.index("lineitem")
    # deterministic: alphabetical among ready tables
    assert got == topological_table_order(tables, edges)


def test_topo_sort_no_edges_is_alpha_and_self_ref_ignored():
    assert topological_table_order(["b", "a"], [("a", "a")]) == ["a", "b"]


def test_topo_sort_cycle_raises():
    with pytest.raises(ValueError, match="cycle"):
        topological_table_order(["a", "b"], [("a", "b"), ("b", "a")])


def test_multitable_order_and_offsets(spark, monkeypatch):
    """Orchestration logic without a database: stub the per-table readers
    with in-memory frames; offsets must filter, order must be referential."""
    frames = {
        "t_parent": spark.createDataFrame([(1,), (2,), (3,)], "seq int"),
        "t_child": spark.createDataFrame([(10,), (20,)], "seq int"),
    }
    monkeypatch.setattr(
        jdbc_mod, "jdbc_query", lambda spark, url, table, properties=None: frames[table]
    )
    out = jdbc_multitable(
        spark,
        "jdbc:stub",
        [
            {"table": "t_child", "offset_column": "seq"},
            {"table": "t_parent", "offset_column": "seq"},
        ],
        offsets={"t_parent": 1, "t_child": None},
        fk_edges=[("t_child", "t_parent")],
        order="REFERENTIAL_CONSTRAINTS",
    )
    names = [n for n, _ in out]
    assert names == ["t_parent", "t_child"]
    by = dict(out)
    assert by["t_parent"].count() == 2  # seq > 1 pushed down
    assert by["t_child"].count() == 2  # no offset yet -> full read


def test_multitable_unknown_order():
    with pytest.raises(ValueError, match="order"):
        jdbc_multitable(None, "jdbc:x", [{"table": "t"}], order="SHUFFLED")


def test_preview_captures_all_lanes_without_writes(spark, tmp_path):
    from datacollector_spark.plans.spec import PipelineSpec

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("error", 1), ("click", 950), ("click", 10)], "event_type string, value int"
    ).write.parquet(src)
    spec = PipelineSpec(
        {
            "pipeline": "p",
            "stages": [
                {"name": "src", "type": "parquet_origin", "path": src, "out": "main"},
                {
                    "name": "sel",
                    "type": "stream_selector",
                    "in": "main",
                    "conditions": [["errors", "event_type = 'error'"]],
                    "default_lane": "ok",
                },
                {
                    "name": "hash",
                    "type": "field_hasher",
                    "in": "ok",
                    "columns": ["event_type"],
                    "target": "h",
                    "out": "hashed",
                },
            ],
        }
    )
    cap = spec.preview(spark, limit_rows=2)
    assert set(cap) >= {"main", "errors", "ok", "hashed"}
    assert len(cap["errors"]) == 1 and cap["errors"][0]["event_type"] == "error"
    assert len(cap["ok"]) == 2  # limit honored
    assert all("h" in r for r in cap["hashed"])  # per-stage output captured
    # no sink side effects: only the source dir exists under tmp_path
    leftovers = [p.name for p in tmp_path.iterdir() if p.name != "src"]
    assert leftovers == []
