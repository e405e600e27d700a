"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry exercises a datacollector_spark operator
(SURVEY.md §2 inventory); ``oracle_sql()`` holds the DuckDB twin. Column
names/aliases match pairwise; double aggregates are rounded identically on
both sides (cross-engine float-sum ordering differs in the last ulp).

The CDC queries derive a deterministic changelog from the ``events`` table
with pure arithmetic (no engine-specific hashing), so the LWW-collapse +
MERGE semantics — the engine's core — are oracle-checked end to end.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# deterministic changelog derived from `events` (cross-engine arithmetic)
# --------------------------------------------------------------------------
def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    base = e.select(
        F.when(F.pmod("event_id", F.lit(97)) < 3, 2)
        .when(F.pmod("event_id", F.lit(97)) < 60, 1)
        .otherwise(3)
        .cast("int")
        .alias("op"),
        F.col("event_id").cast("long").alias("lsn"),
        F.pmod("event_id", F.lit(50)).cast("int").alias("seq_in_tx"),
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        F.pmod("event_id", F.lit(40)).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
            (F.pmod("event_id", F.lit(4)) + 1).cast("int"),
        ).alias("role"),
        F.concat(F.col("event_type"), F.lit("-v"), F.col("event_id").cast("string")).alias(
            "text"
        ),
        F.when(
            F.pmod("event_id", F.lit(4)) == 3,
            F.concat(F.lit("tool-"), F.pmod("event_id", F.lit(16)).cast("string")),
        ).alias("tool"),
        F.col("ts"),
    )
    dups = base.where(F.pmod("lsn", F.lit(37)) == 0)  # duplicate delivery
    return base.unionByName(dups)


_CHANGELOG_CTE = """
changelog AS (
  SELECT
    CAST(CASE WHEN event_id % 97 < 3 THEN 2
              WHEN event_id % 97 < 60 THEN 1 ELSE 3 END AS INT) AS op,
    CAST(event_id AS BIGINT)            AS lsn,
    CAST(event_id % 50 AS INT)          AS seq_in_tx,
    'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(event_id % 40 AS INT)          AS turn_idx,
    CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                      WHEN 2 THEN 'system' ELSE 'tool' END AS role,
    event_type || '-v' || CAST(event_id AS VARCHAR) AS text,
    CASE WHEN event_id % 4 = 3
         THEN 'tool-' || CAST(event_id % 16 AS VARCHAR) END AS tool,
    ts
  FROM events
  UNION ALL
  SELECT
    CAST(CASE WHEN event_id % 97 < 3 THEN 2
              WHEN event_id % 97 < 60 THEN 1 ELSE 3 END AS INT),
    CAST(event_id AS BIGINT), CAST(event_id % 50 AS INT),
    'conv-' || CAST(user_id AS VARCHAR), CAST(event_id % 40 AS INT),
    CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                      WHEN 2 THEN 'system' ELSE 'tool' END,
    event_type || '-v' || CAST(event_id AS VARCHAR),
    CASE WHEN event_id % 4 = 3
         THEN 'tool-' || CAST(event_id % 16 AS VARCHAR) END,
    ts
  FROM events WHERE event_id % 37 = 0
)
"""

_LWW_CTE = (
    _CHANGELOG_CTE
    + """,
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY lsn, seq_in_tx ORDER BY lsn) AS _rn
    FROM changelog) WHERE _rn = 1
),
last_per_key AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, seq_in_tx DESC) AS _rk
    FROM dedup) WHERE _rk = 1
)
"""
)

_MD5LONG = "CAST(('0x' || substring(md5({x}),1,15)) AS BIGINT)"


def _md5_salt_sql(id_expr: str, salt: str) -> str:
    """DuckDB twin of hashing.md5_long(col, salt=...) for an id column."""
    from datacollector_spark.functions.hashing import md5_long_sql

    return md5_long_sql(f"CAST({id_expr} AS VARCHAR)", salt)


# IVF ANN relational definition (shared by the inline operator and the
# persisted-index search — both must match it bit-for-bit): deterministic
# quantizer (seed centroids = the 8 smallest-id vectors, kmeans_iters=0),
# assignment/probes by cosine with cos DESC, cid ASC tie-break, nprobe=2.
_IVF_ORACLE = """
    WITH cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
             CAST(embedding AS DOUBLE[]) AS cv
      FROM (SELECT vec_id, embedding FROM embeddings
            ORDER BY vec_id LIMIT 8)),
    assigned AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT c.vec_id, c.embedding, ct.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY list_cosine_similarity(
                   CAST(c.embedding AS DOUBLE[]), ct.cv) DESC,
                 ct.cid) AS rn
        FROM embeddings c, cent ct)
      WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, embedding AS qv, cid FROM (
        SELECT q.vec_id, q.embedding, ct.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]), ct.cv) DESC,
                 ct.cid) AS rn
        FROM embeddings q, cent ct WHERE q.vec_id < 8)
      WHERE rn <= 2),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(p.qv AS DOUBLE[]),
                                    CAST(a.embedding AS DOUBLE[])) AS cos
      FROM probes p JOIN assigned a
        ON a.cid = p.cid AND a.vec_id != p.query_id)
    SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank FROM (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
"""


def _minhash_pairs_cte_block(num_hashes=32, bands=8, threshold=0.4) -> str:
    """CTE chain ending in pairs(id_a, id_b, jaccard) — shared by the
    minhash-LSH oracle and the connected-components oracle. Same md5-derived
    28-bit base, same affine (a,b) literals, same band hashing as the Spark
    operator — exact pair parity."""
    from datacollector_spark.functions.hashing import affine_params
    from datacollector_spark.operators.dedup import MINHASH_PRIME

    rpb = num_hashes // bands
    params = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(affine_params(num_hashes, MINHASH_PRIME))
    )
    return f"""{_SHINGLE_CTE},
        hashed AS (
          SELECT doc_id, s,
                 CAST(('0x' || substring(md5(s),1,7)) AS BIGINT) AS base
          FROM shingles),
        params(i, a, b) AS (VALUES {params}),
        sig AS (
          SELECT doc_id, p.i,
                 min((p.a * h.base + p.b) % {MINHASH_PRIME}) AS hv
          FROM hashed h CROSS JOIN params p GROUP BY doc_id, p.i),
        bands AS (
          SELECT doc_id, i // {rpb} AS band,
                 CAST(('0x' || substring(md5(
                   string_agg(CAST(hv AS VARCHAR), ',' ORDER BY i)),1,15)) AS BIGINT) AS bh
          FROM sig GROUP BY doc_id, i // {rpb}),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        shared AS (
          SELECT c.id_a, c.id_b, count(*) AS cnt
          FROM cand c
          JOIN shingles sa ON sa.doc_id = c.id_a
          JOIN shingles sb ON sb.doc_id = c.id_b AND sb.s = sa.s
          GROUP BY c.id_a, c.id_b),
        pairs AS (
          SELECT id_a, id_b,
                 ROUND(CAST(cnt AS DOUBLE) / (na.n + nb.n - cnt), 6) AS jaccard
          FROM shared
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b
          WHERE CAST(cnt AS DOUBLE) / (na.n + nb.n - cnt) >= {threshold})"""


def _minhash_lsh_oracle(num_hashes=32, bands=8, threshold=0.4) -> str:
    """DuckDB twin of dedup.minhash_lsh_pairs."""
    return f"""
        WITH {_minhash_pairs_cte_block(num_hashes, bands, threshold)}
        SELECT id_a, id_b, jaccard FROM pairs
    """


def _components_oracle(num_hashes=32, bands=8, threshold=0.4) -> str:
    """DuckDB twin of dedup.connected_components over the minhash pair
    graph: recursive transitive closure, label = min reachable id — the
    same fixpoint min-label propagation converges to in Spark."""
    return f"""
        WITH RECURSIVE {_minhash_pairs_cte_block(num_hashes, bands, threshold)},
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        reach(node, label) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst)
        SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node
    """


def _simhash_oracle(max_hamming=3, chunks=4, bits=60) -> str:
    """DuckDB twin of dedup.simhash_near_pairs (md5_long token hash)."""
    width = bits // chunks
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
          FROM documents),
        th AS (
          SELECT doc_id,
                 CAST(('0x' || substring(md5(t),1,15)) AS BIGINT) AS h
          FROM toks),
        votes AS (
          SELECT doc_id, bt.b,
                 SUM(CASE WHEN (h >> bt.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM th CROSS JOIN (SELECT unnest(generate_series(0, {bits - 1})) AS b) bt
          GROUP BY doc_id, bt.b),
        fp AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                               ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS fp
          FROM votes GROUP BY doc_id),
        chunks AS (
          SELECT doc_id, fp, ct.c,
                 (fp >> (ct.c * {width})) & {(1 << width) - 1} AS cv
          FROM fp CROSS JOIN (SELECT unnest(generate_series(0, {chunks - 1})) AS c) ct),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 a.fp AS fa, b.fp AS fb
          FROM chunks a JOIN chunks b
            ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(fa, fb)) <= {max_hamming}
    """


def _bucket_sql(dim: int, planes: int) -> str:
    """Sign-bucket expression shared by the LSH oracles: same md5-seeded
    hyperplane literals, same left-assoc double dot product as Spark."""
    from datacollector_spark.operators.similarity import _hyperplane

    def dot_expr(plane: int) -> str:
        w = _hyperplane(dim, plane)
        return " + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE) * {w[d]!r}" for d in range(dim)
        )

    return " + ".join(
        f"CASE WHEN ({dot_expr(p)}) > 0 THEN {1 << p} ELSE 0 END"
        for p in range(planes)
    )


def _embedding_neardup_oracle(dim=64, planes=6, threshold=0.95) -> str:
    """DuckDB twin of similarity.embedding_near_dup_pairs over the corpus
    with planted x2-scaled duplicates."""
    return f"""
        WITH corpus AS (
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000,
                 list_transform(embedding, x -> x * CAST(2.0 AS REAL))
          FROM embeddings),
        b AS (
          SELECT vec_id, embedding, ({_bucket_sql(dim, planes)}) AS bucket
          FROM corpus)
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])), 6)
                 AS cosine
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(c.embedding AS DOUBLE[])) >= {threshold}
    """


def _ann_lsh_oracle(dim=64, planes=6, k=5) -> str:
    """DuckDB twin of similarity.lsh_ann_topk."""
    bucket = _bucket_sql(dim, planes)
    probes = ", ".join(f"({m})" for m in [0] + [1 << p for p in range(planes)])
    return f"""
        WITH b AS (
          SELECT vec_id, embedding, ({bucket}) AS bucket FROM embeddings),
        q AS (
          SELECT vec_id AS query_id, embedding AS qe, bucket AS qb
          FROM b WHERE vec_id < 8),
        probes(m) AS (VALUES {probes}),
        qp AS (SELECT query_id, qe, xor(qb, m) AS pb FROM q CROSS JOIN probes),
        scored AS (
          SELECT DISTINCT qp.query_id, c.vec_id AS neighbor_id,
                 list_cosine_similarity(CAST(qp.qe AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])) AS cos
          FROM qp JOIN b c ON c.bucket = qp.pb AND c.vec_id != qp.query_id)
        SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank FROM (
          SELECT query_id, neighbor_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored)
        WHERE rank <= {k}
    """


_MEDIA_CTE = """
media AS (
  SELECT t.media_id,
         CASE CAST((t.media_id * 2654435761 + 42) % 3 AS INT)
              WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         CAST((t.media_id * 16807 + 42) % 60000 + 1000 AS INT) AS duration_ms,
         sha256('payload-' || CAST(t.media_id AS VARCHAR)) AS hex
  FROM generate_series(0, 255) AS t(media_id)
)
"""


def _media_features_oracle(dim=16) -> str:
    """DuckDB twin of multimodal.extract_image_features over the synthetic
    media table: payload = 64 ASCII bytes of the sha256 hex digest; feature
    j = little-endian uint32 of bytes 4j..4j+3, / 2^32, rounded to float32."""

    def feat(j: int) -> str:
        b = " + ".join(
            f"ascii(substr(hex, {4 * j + bk + 1}, 1)) * {1 << (8 * bk)}"
            for bk in range(4)
        )
        return f"CAST(CAST(({b}) / 4294967296.0 AS REAL) AS DOUBLE)"

    total = " + ".join(feat(j) for j in range(dim))
    return f"""
        WITH {_MEDIA_CTE}
        SELECT media_id, CAST({dim} AS INT) AS feat_dim, TRUE AS decode_ok,
               ROUND({total}, 4) AS feat_sum
        FROM media WHERE kind = 'image'
    """


_FRAME_SAMPLING_ORACLE = f"""
    WITH {_MEDIA_CTE}
    SELECT media_id, CAST(g.frame_ts_ms AS INT) AS frame_ts_ms,
           'application/x-fake-' || kind AS mime
    FROM media, UNNEST(generate_series(0, duration_ms, 1000)) AS g(frame_ts_ms)
    WHERE kind = 'video'
"""

_SHINGLE_CTE = """
docs AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS s
  FROM docs, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3
  UNION
  SELECT DISTINCT doc_id, array_to_string(w, ' ') AS s FROM docs WHERE len(w) < 3
)
"""


# --------------------------------------------------------------------------
# CDC core
# --------------------------------------------------------------------------
def q_cdc_lww_final_state(spark, sf_dir):
    from datacollector_spark.operators.collapse import lww_collapse

    collapsed = lww_collapse(_changelog(spark, sf_dir))
    return collapsed.where(F.col("op") != 2).select(
        "conv_id", "turn_idx", "text", "lsn"
    )


def q_cdc_lake_merge_final_state(spark, sf_dir):
    """Full engine path: collapse + LakeTable MERGE (tombstones, LSN guard,
    bucket COW), then read back the committed snapshot."""
    from datacollector_spark.lake import LakeTable
    from datacollector_spark.model import transcripts_schema
    from datacollector_spark.operators.collapse import lww_collapse

    table = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="dcs-lake-"),
        transcripts_schema(),
        ["conv_id", "turn_idx"],
        num_buckets=16,
        overwrite=True,
    )
    table.merge(lww_collapse(_changelog(spark, sf_dir)), commit_key="verify")
    return table.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def q_cdc_mor_final_state(spark, sf_dir):
    """Merge-on-read path: three MOR delta appends + read-side LWW
    reconstruction + compaction — final state must equal the same LWW SQL."""
    from datacollector_spark.lake import LakeTable
    from datacollector_spark.model import transcripts_schema
    from datacollector_spark.operators.collapse import lww_collapse

    table = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="dcs-mor-"),
        transcripts_schema(),
        ["conv_id", "turn_idx"],
        num_buckets=16,
        overwrite=True,
    )
    ch = _changelog(spark, sf_dir)
    for i in range(3):
        batch = ch.where(F.pmod("lsn", F.lit(3)) == i)
        table.merge(lww_collapse(batch), commit_key=f"mor-{i}", mode="mor")
    table.compact_deltas()
    return table.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def q_cdc_op_decode(spark, sf_dir):
    # OperationType.java:29-33 code -> name decode + distribution
    name = (
        F.when(F.col("op") == 1, "INSERT")
        .when(F.col("op") == 2, "DELETE")
        .when(F.col("op") == 3, "UPDATE")
        .otherwise("UNSUPPORTED")
    )
    return (
        _changelog(spark, sf_dir)
        .select(name.alias("op_name"))
        .groupBy("op_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_cdc_dedup_rate(spark, sf_dir):
    df = _changelog(spark, sf_dir)
    return df.agg(
        F.count(F.lit(1)).alias("n_delivered"),
        F.countDistinct("lsn", "seq_in_tx").alias("n_logical"),
        (F.count(F.lit(1)) - F.countDistinct("lsn", "seq_in_tx")).alias("n_duplicates"),
    )


# --------------------------------------------------------------------------
# processor stages (SURVEY.md §2.3)
# --------------------------------------------------------------------------
def q_proc_stream_selector(spark, sf_dir):
    from datacollector_spark.operators.processors import stream_selector

    lanes = stream_selector(
        _t(spark, sf_dir, "events"),
        [("errors", "event_type = 'error'"), ("high", "value >= 900")],
        default_lane="rest",
    )
    counts = [
        df.agg(F.lit(lane).alias("lane"), F.count(F.lit(1)).alias("n"))
        for lane, df in lanes.items()
    ]
    # empty lanes emit nothing (matches SQL GROUP BY semantics)
    return reduce(DataFrame.unionByName, counts).where(F.col("n") > 0)


def q_proc_precondition_filter(spark, sf_dir):
    from datacollector_spark.operators.processors import precondition_filter

    ok, err = precondition_filter(
        _t(spark, sf_dir, "events"), "value >= 100", required_fields=["props"]
    )
    return ok.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_pass")).join(
        err.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_error")),
        "event_type",
        "full_outer",
    ).select(
        "event_type",
        F.coalesce("n_pass", F.lit(0)).alias("n_pass"),
        F.coalesce("n_error", F.lit(0)).alias("n_error"),
    )


def q_proc_expression_evaluator(spark, sf_dir):
    from datacollector_spark.operators.processors import expression_evaluator

    df = expression_evaluator(
        _t(spark, sf_dir, "lineitem"),
        {"revenue": "l_extendedprice * (1 - l_discount)"},
    )
    return df.groupBy("l_returnflag").agg(
        F.round(F.sum("revenue"), 2).alias("sum_revenue"),
        F.count(F.lit(1)).alias("n"),
    )


def q_proc_field_type_converter(spark, sf_dir):
    from datacollector_spark.operators.processors import field_type_converter

    df = field_type_converter(
        _t(spark, sf_dir, "orders"),
        {"o_totalprice": "decimal(12,2)", "o_orderkey": "string"},
    )
    return df.select(
        F.col("o_orderkey").alias("okey_str"),
        # decimal cast exercised, compared as double (cross-engine decimal
        # wire formats differ)
        F.col("o_totalprice").cast("double").alias("price_dec"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
    )


def q_proc_field_masker(spark, sf_dir):
    from datacollector_spark.operators.processors import field_masker

    df = field_masker(
        _t(spark, sf_dir, "customer"), ["c_name"], mask_type="VARIABLE_LENGTH"
    )
    return df.select("c_custkey", F.col("c_name").alias("masked_name"))


def q_proc_field_hasher(spark, sf_dir):
    from datacollector_spark.operators.processors import field_hasher

    df = field_hasher(
        _t(spark, sf_dir, "customer"), ["c_name", "c_mktsegment"], "rec_hash", "md5"
    )
    return df.select("c_custkey", "rec_hash")


def q_proc_field_splitter(spark, sf_dir):
    from datacollector_spark.operators.processors import field_splitter

    df = field_splitter(
        _t(spark, sf_dir, "part"), "p_type", " ", ["t1", "t2", "t3"]
    )
    return df.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n"))


def q_proc_value_replacer(spark, sf_dir):
    from datacollector_spark.operators.processors import value_replacer

    df = value_replacer(
        _t(spark, sf_dir, "customer"),
        conditional=[("c_acctbal", "c_acctbal < 0", 0.0)],
    )
    return df.select("c_custkey", F.round("c_acctbal", 2).alias("acctbal_floor"))


def q_proc_list_pivot(spark, sf_dir):
    from datacollector_spark.operators.processors import list_pivot

    df = _t(spark, sf_dir, "part").withColumn("words", F.split("p_name", " "))
    piv = list_pivot(df.select("p_partkey", "words"), "words")
    return piv.groupBy(F.col("words").alias("word")).agg(
        F.count(F.lit(1)).alias("n")
    )


def q_proc_json_parser(spark, sf_dir):
    from datacollector_spark.operators.processors import json_parser

    df = json_parser(
        _t(spark, sf_dir, "events"), "props", "k INT", "parsed"
    )
    return df.select("event_id", F.col("parsed.k").alias("k"))


def q_proc_base64(spark, sf_dir):
    from datacollector_spark.operators.processors import base64_codec

    df = base64_codec(
        _t(spark, sf_dir, "customer").withColumn("b", F.col("c_name").cast("binary")),
        "b",
        "name_b64",
    )
    return df.select("c_custkey", "name_b64")


def q_proc_scripting_pandas(spark, sf_dir):
    from datacollector_spark.operators.processors import scripting_processor

    def script(pdf):
        # user 'script' over the batch — vectorized pandas, no row loop
        out = pdf[["doc_id"]].copy()
        out["text_len"] = pdf["text"].str.len().astype("int32")
        return out

    return scripting_processor(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        script,
        "doc_id long, text_len int",
    )


def q_proc_spark_evaluator(spark, sf_dir):
    """Spark Evaluator (spark-processor-protolib/.../spark/SparkProcessor.java):
    a user transformer runs over the batch with the TransformResult
    (result, errors) two-lane contract and init params. Both lanes feed the
    result: ok-lane rows banded by price, error lane rolled up as band -1."""
    from datacollector_spark.operators.processors import spark_evaluator

    def transformer(d, cutoff):
        ok = d.where(F.col("o_totalprice") >= cutoff).withColumn(
            "band", F.floor(F.col("o_totalprice") / 50000).cast("int")
        )
        return ok, d.where(F.col("o_totalprice") < cutoff)

    src = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ok, err = spark_evaluator(src, transformer, init_params={"cutoff": 150000.0})
    bands = ok.groupBy("band").agg(F.count(F.lit(1)).alias("n"))
    err_band = (
        err.groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(-1).cast("int").alias("band"), "n")
    )
    return bands.unionByName(err_band)


def q_proc_log_parser(spark, sf_dir):
    """Synthesize an access-log line from events, parse it back with the LOG
    format (regex groups) — logparser/LogParserProcessor.java."""
    from datacollector_spark.sources.formats import parse_log

    df = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("host-"),
            F.col("user_id").cast("string"),
            F.lit(' "GET /'),
            F.col("event_type"),
            F.lit('" '),
            (F.pmod("event_id", F.lit(5)) * 100 + 200).cast("string"),
        ).alias("raw"),
    )
    pattern = r'^(\S+) "(\S+) (\S+)" (\d{3})$'
    out = parse_log(df, "raw", pattern, {"host": 1, "method": 2, "path": 3, "status": 4})
    return out.select("event_id", "host", "method", "path", "status")


def q_format_csv_roundtrip(spark, sf_dir):
    """DELIMITED generate -> parse roundtrip (DataFormat.java DELIMITED)."""
    from datacollector_spark.sources.formats import generate_delimited, parse_delimited

    df = _t(spark, sf_dir, "events").select(
        "event_id",
        generate_delimited(F.struct(F.col("event_type"), F.col("user_id"))).alias("line"),
    )
    parsed = df.select(
        "event_id",
        "line",
        parse_delimited(F.col("line"), "et STRING, uid BIGINT").alias("r"),
    )
    return parsed.select("event_id", "line", F.col("r.et").alias("et"), F.col("r.uid").alias("uid"))


def q_proc_record_dedup(spark, sf_dir):
    from datacollector_spark.operators.dedup import exact_dedup

    return exact_dedup(
        _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type"),
        ["user_id", "event_type"],
        "event_id",
    )


def q_proc_record_dedup_split(spark, sf_dir):
    """The Record Deduplicator's full (unique, duplicate) lane split
    (DeDupProcessor.java:122-143), deterministic across partition layouts:
    winner = min event_id per (user_id, event_type); both lanes returned
    with a lane marker."""
    from datacollector_spark.operators.processors import record_deduplicator

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    uniq, dups = record_deduplicator(
        ev, ["user_id", "event_type"], order_column="event_id"
    )
    return uniq.withColumn("lane", F.lit("unique")).unionByName(
        dups.withColumn("lane", F.lit("duplicate"))
    )


# --------------------------------------------------------------------------
# lookups / joins / aggregations
# --------------------------------------------------------------------------
def q_lookup_broadcast_dim(spark, sf_dir):
    from datacollector_spark.operators.processors import broadcast_lookup

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = broadcast_lookup(
        li.withColumnRenamed("l_partkey", "p_partkey"), part, on="p_partkey"
    )
    return joined.groupBy("p_brand").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "brand_revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_lookup_static_kv(spark, sf_dir):
    from datacollector_spark.operators.processors import static_lookup

    region = {
        int(r["r_regionkey"]): r["r_name"]
        for r in _t(spark, sf_dir, "region").collect()
    }
    df = static_lookup(
        _t(spark, sf_dir, "nation"), region, "n_regionkey", "region_name"
    )
    return df.select("n_nationkey", "n_name", "region_name")


def q_lookup_ip_range(spark, sf_dir):
    """Range-interval enrichment (GeoIP analog): map a synthetic 'ip' to a
    region by value BETWEEN lo AND hi against a broadcast range table."""
    from datacollector_spark.operators.processors import range_lookup

    facts = _t(spark, sf_dir, "events").select(
        "event_id", (F.pmod(F.col("event_id") * 2654435761, F.lit(1000))).alias("ip")
    )
    ranges = spark.createDataFrame(
        [(0, 249, "apac"), (250, 499, "emea"), (500, 749, "amer"), (750, 999, "latam")],
        "lo long, hi long, geo string",
    )
    out = range_lookup(facts, ranges, "ip", "lo", "hi")
    return out.groupBy("geo").agg(F.count(F.lit(1)).alias("n"))


def q_lookup_split_multiplicity(spark, sf_dir):
    """SPLIT multiplicity mode of the dimension lookup (1:N matches emit N
    records — MultipleValuesBehavior.java SPLIT_INTO_MULTIPLE_RECORDS):
    nation enriched with ALL its suppliers via a broadcast join."""
    from datacollector_spark.operators.processors import broadcast_lookup

    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey"),
        "s_name",
        F.round("s_acctbal", 2).alias("s_acctbal"),
    )
    return broadcast_lookup(nation, supp, on="n_nationkey", multiple="SPLIT")


def q_agg_metrics_rollup(spark, sf_dir):
    # the Metric Aggregation processor shape (stats-lib, SURVEY.md §2.3)
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def q_window_topk_per_key(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("user_id", "event_id", "value", "rank")
    )


def q_window_tumbling_counts(spark, sf_dir):
    """Tumbling event-time window aggregation (SURVEY §2.7 — native in
    Spark, absent in the reference): per-hour per-type event counts."""
    df = _t(spark, sf_dir, "events")
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q_window_session_counts(spark, sf_dir):
    """Session windows per user (30-min gap): event count + session span.
    Spark's session_window vs the classic gaps-and-islands SQL in DuckDB."""
    df = _t(spark, sf_dir, "events")
    return (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_event"))
        .select("user_id", "first_event", "n")
    )


def q_framework_fan_in(spark, sf_dir):
    """Multiplexer/combiner (SURVEY §2.1): fan a source out to two processed
    lanes, union them back (CombinerPipe ≙ unionByName)."""
    ev = _t(spark, sf_dir, "events")
    lane_a = ev.where(F.col("value") >= 500).withColumn("lane", F.lit("high"))
    lane_b = ev.where(F.col("value") < 500).withColumn(
        "lane", F.lit("low")
    )
    combined = lane_a.unionByName(lane_b)
    return combined.groupBy("lane", "event_type").agg(F.count(F.lit(1)).alias("n"))


def q_tpch_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-01")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_tpch_top_orders(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev")
        )
    )
    # orderBy().limit(k) plans TakeOrderedAndProject (per-partition partial
    # top-k, k rows to the driver) — no single-partition global window; the
    # rank window then runs over only the 10 surviving rows.
    top = rev.orderBy(F.col("_rev").desc(), "l_orderkey").limit(10)
    w = Window.orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "l_orderkey", F.round("_rev", 2).alias("revenue"), "rank"
    )


# --------------------------------------------------------------------------
# training-data ops: dedup / similarity / text / multimodal
# --------------------------------------------------------------------------
def q_dedup_exact_documents(spark, sf_dir):
    from datacollector_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), ["text"], "doc_id").select(
        "doc_id", "dup_count"
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    from datacollector_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        shingle_n=3,
        threshold=0.4,
        max_shingle_df=100,  # stop-shingle cap, mirrored in the oracle
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_minhash_lsh(spark, sf_dir):
    from datacollector_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        verify_threshold=0.4,
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_components(spark, sf_dir):
    """Pairs -> clusters: connected components over the minhash near-dup
    graph (min-label propagation to fixpoint) — the step that turns pair
    evidence into corpus dedup decisions (keep min-id doc per component)."""
    from datacollector_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        verify_threshold=0.4,
    )
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("component"),
    )


def q_corpus_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment: pure function of
    (doc_id, salt) — stable across runs/partitionings/engines, never
    reassigns existing docs when the corpus grows."""
    from datacollector_spark.operators.curation import hash_split

    return hash_split(
        _t(spark, sf_dir, "documents").select("doc_id"),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )


def _hash_split_oracle(fractions, salt="split-v1") -> str:
    """DuckDB twin of curation.hash_split: identical md5-60bit uniform and
    the IDENTICAL Python-accumulated threshold literals (0.8 + 0.1 is
    0.9000000000000001 in both engines only if the same repr is inlined)."""
    from datacollector_spark.functions.hashing import md5_long_sql

    u = f"CAST({md5_long_sql('CAST(doc_id AS VARCHAR)', salt)} AS DOUBLE) / {float(1 << 60)!r}"
    names = list(fractions)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += fractions[name]
        whens.append(f"WHEN u < {cum!r} THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
    return f"""
        SELECT doc_id, {case} AS split
        FROM (SELECT doc_id, {u} AS u FROM documents)
    """


def q_dedup_components_star(spark, sf_dir):
    """Same clusters as dedup_components, computed by the large-star/
    small-star algorithm (Kiveris et al.) — O(log n) rounds independent of
    graph diameter, the swap-in for adversarial chain graphs. Oracle-
    checked against the identical recursive-CTE transitive closure, so the
    two CC implementations are proven pointwise equal on real pairs."""
    from datacollector_spark.operators.dedup import (
        connected_components_star,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=32,
        bands=8,
        verify_threshold=0.4,
    )
    comp = connected_components_star(pairs)
    return comp.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("label").cast("long").alias("component"),
    )


def q_el_ported_config(spark, sf_dir):
    """A stock SDC pipeline-config JSON (origin -> StreamSelector ->
    ExpressionEvaluator) ported end to end: PipelineSpec.from_sdc_config
    translates every EL string (Java substring/indexOf semantics,
    literal-safe boolean rewrite) and wires the lanes; the oracle is the
    hand-written SQL a reference user would expect the pipeline to mean.
    Exercises functions/el.py + plans/spec.py against real config shapes
    (SelectorProcessor.java lanePredicates,
    ExpressionProcessorConfig.java fieldToSet/expression)."""
    from datacollector_spark.plans.spec import PipelineSpec

    config = {
        "pipelineConfig": {
            "title": "ported-selector-evaluator",
            "stages": [
                {
                    "instanceName": "Origin_01",
                    "stageName": "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource",
                    "configuration": [],
                    "inputLanes": [],
                    "outputLanes": ["Origin_01OutputLane1"],
                },
                {
                    "instanceName": "Selector_01",
                    "stageName": "com_streamsets_pipeline_stage_processor_selector_SelectorDProcessor",
                    "configuration": [
                        {
                            "name": "lanePredicates",
                            "value": [
                                {
                                    "outputLane": "Selector_01OutputLane1",
                                    "predicate": "${record:value('/event_type') == 'click' "
                                    "&& !(record:value('/value') < 10.0)}",
                                },
                                {"outputLane": "Selector_01OutputLane2", "predicate": "default"},
                            ],
                        }
                    ],
                    "inputLanes": ["Origin_01OutputLane1"],
                    "outputLanes": ["Selector_01OutputLane1", "Selector_01OutputLane2"],
                },
                {
                    "instanceName": "Expr_01",
                    "stageName": "com_streamsets_pipeline_stage_processor_expression_ExpressionDProcessor",
                    "configuration": [
                        {
                            "name": "expressionProcessorConfigs",
                            "value": [
                                {
                                    "fieldToSet": "/etype_up",
                                    "expression": "${str:toUpper(record:value('/event_type'))}",
                                },
                                {
                                    "fieldToSet": "/marker",
                                    "expression": "${str:substring(record:value('/event_type'), 0, 3)}",
                                },
                                {
                                    "fieldToSet": "/eid_bucket",
                                    "expression": "${record:value('/event_id') % 10}",
                                },
                            ],
                        }
                    ],
                    "inputLanes": ["Selector_01OutputLane1"],
                    "outputLanes": ["Expr_01OutputLane1"],
                },
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"Origin_01": {"path": f"{sf_dir}/events.parquet"}}
    )
    return spec.build(spark)["Expr_01OutputLane1"]


def q_el_dir_template(spark, sf_dir):
    """Time-basis directory template (the reference's file-sink layout EL,
    HdfsTargetConfigBean.java:175-187 + TimeEL.java:50-99): resolve
    ``/out/${YYYY()}-${MM()}-${DD()}/${record:value('/event_type')}`` per
    row against the event-time driver and count rows per directory — the
    partitionBy layout a Spark FS sink would write."""
    from datacollector_spark.functions.el import el_dir_template

    return (
        _t(spark, sf_dir, "events")
        .withColumn(
            "dir",
            el_dir_template(
                "/out/${YYYY()}-${MM()}-${DD()}/${record:value('/event_type')}", "ts"
            ),
        )
        .groupBy("dir")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_el_ported_config_2(spark, sf_dir):
    """A ten-stage stock-shaped SDC export ported end to end —
    round-5 breadth: JSON Parser (declared schema), Field Flattener
    (ENTIRE_RECORD), Field Masker (VARIABLE_LENGTH), Field Value Replacer
    (conditional GREATER_THAN + null backfill), Expression Evaluator,
    Field Splitter (TO_LAST_FIELD, original REMOVED), Local KV Lookup
    (keyExpr EL), and a BY_TYPE whole-type Field Type Converter
    (DATETIME -> LONG), each translated from the exported
    configuration-bean shapes (FieldMaskConfig.java,
    FieldValueReplacerConfig.java, SplitterDProcessor.java,
    LocalLookupConfig.java, WholeTypeConverterConfig.java)."""
    from datacollector_spark.plans.spec import PipelineSpec

    def stage(name, klass, conf, ins, outs):
        return {
            "instanceName": name,
            "stageName": klass,
            "configuration": [{"name": k, "value": v} for k, v in conf.items()],
            "inputLanes": ins,
            "outputLanes": outs,
        }

    config = {
        "pipelineConfig": {
            "title": "ported-breadth",
            "pipelineId": "ported-breadth-v1",
            "stages": [
                stage(
                    "Origin_01",
                    "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource",
                    {}, [], ["L_origin"],
                ),
                stage(
                    "Json_01",
                    "com_streamsets_pipeline_stage_processor_jsonparser_JsonParserDProcessor",
                    {"fieldPathToParse": "/props", "parsedFieldPath": "/pj"},
                    ["L_origin"], ["L_json"],
                ),
                stage(
                    "Flatten_01",
                    "com_streamsets_pipeline_stage_processor_fieldflattener_FieldFlattenerDProcessor",
                    {"config.flattenType": "ENTIRE_RECORD", "config.nameSeparator": "_"},
                    ["L_json"], ["L_flat"],
                ),
                stage(
                    "Mask_01",
                    "com_streamsets_pipeline_stage_processor_fieldmask_FieldMaskDProcessor",
                    {
                        "fieldMaskConfigs": [
                            {"fields": ["/props"], "maskType": "VARIABLE_LENGTH"}
                        ]
                    },
                    ["L_flat"], ["L_mask"],
                ),
                stage(
                    "Replace_01",
                    "com_streamsets_pipeline_stage_processor_fieldvaluereplacer_FieldValueReplacerDProcessor",
                    {
                        "fieldsToReplaceIfNull": [
                            {"fields": ["/event_type"], "newValue": "unknown"}
                        ],
                        "fieldsToConditionallyReplace": [
                            {
                                "fieldNames": ["/value"],
                                "operator": "GREATER_THAN",
                                "comparisonValue": "400",
                                "replacementValue": "400.0",
                            }
                        ],
                    },
                    ["L_mask"], ["L_repl"],
                ),
                stage(
                    "Expr_01",
                    "com_streamsets_pipeline_stage_processor_expression_ExpressionDProcessor",
                    {
                        "expressionProcessorConfigs": [
                            {
                                "fieldToSet": "/joined",
                                "expression": "${str:concat(str:concat("
                                "record:value('/event_type'), '::'), "
                                "record:value('/event_id') % 10)}",
                            }
                        ]
                    },
                    ["L_repl"], ["L_expr"],
                ),
                stage(
                    "Split_01",
                    "com_streamsets_pipeline_stage_processor_splitter_SplitterDProcessor",
                    {
                        "fieldPath": "/joined",
                        "separator": "::",
                        "fieldPathsForSplits": ["/etype_part", "/bucket_part"],
                        "tooManySplitsAction": "TO_LAST_FIELD",
                        "originalFieldAction": "REMOVE",
                    },
                    ["L_expr"], ["L_split"],
                ),
                stage(
                    "KV_01",
                    "com_streamsets_pipeline_stage_processor_kv_local_LocalLookupDProcessor",
                    {
                        "conf.values": [
                            {"key": "click", "value": "Click Event"},
                            {"key": "view", "value": "View Event"},
                            {"key": "purchase", "value": "Purchase"},
                            {"key": "signup", "value": "Signup"},
                            {"key": "error", "value": "Error"},
                        ],
                        "conf.lookups": [
                            {
                                "keyExpr": "${record:value('/event_type')}",
                                "outputFieldPath": "/label",
                            }
                        ],
                    },
                    ["L_split"], ["L_kv"],
                ),
                stage(
                    "Convert_01",
                    "com_streamsets_pipeline_stage_processor_fieldtypeconverter_FieldTypeConverterDProcessor",
                    {
                        "convertBy": "BY_TYPE",
                        "wholeTypeConverterConfigs": [
                            {"sourceType": "DATETIME", "targetType": "LONG"}
                        ],
                    },
                    ["L_kv"], ["L_conv"],
                ),
                stage(
                    "Trash_01",
                    "com_streamsets_pipeline_stage_destination_devnull_ToErrorNullDTarget",
                    {}, ["L_conv"], [],
                ),
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config,
        origin_overrides={"Origin_01": {"path": f"{sf_dir}/events.parquet"}},
        stage_overrides={"Json_01": {"schema": "k bigint"}},
    )
    return spec.build(spark)["L_conv"]


def q_sdc_ported_dedup_fanin(spark, sf_dir):
    """Record Deduplicator ported from config (two output lanes:
    UNIQUE + DUPLICATE, DeDupProcessor.java OutputStreams) feeding a
    FAN-IN target (multiple inputLanes -> lane_combiner/unionByName, the
    runner's CombinerPipe.java). The union of the two lanes must be
    EXACTLY the input with multiplicity — proving the dedup split
    partitions the batch and the config-level combiner wires fan-in."""
    from datacollector_spark.plans.spec import PipelineSpec

    config = {
        "pipelineConfig": {
            "title": "ported-dedup-fanin",
            "stages": [
                {
                    "instanceName": "Origin_01",
                    "stageName": "com_streamsets_pipeline_stage_origin_spooldir_SpoolDirDSource",
                    "configuration": [],
                    "inputLanes": [],
                    "outputLanes": ["L_origin"],
                },
                {
                    "instanceName": "DeDup_01",
                    "stageName": "com_streamsets_pipeline_stage_processor_dedup_DeDupDProcessor",
                    "configuration": [
                        {"name": "compareFields", "value": "SPECIFIED_FIELDS"},
                        {"name": "fieldsToCompare", "value": ["/user_id", "/event_type"]},
                    ],
                    "inputLanes": ["L_origin"],
                    "outputLanes": ["L_unique", "L_dup"],
                },
                {
                    "instanceName": "Target_01",
                    "stageName": "com_streamsets_pipeline_stage_destination_devnull_NullDTarget",
                    "configuration": [],
                    "inputLanes": ["L_unique", "L_dup"],
                    "outputLanes": [],
                },
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config, origin_overrides={"Origin_01": {"path": f"{sf_dir}/events.parquet"}}
    )
    return spec.build(spark)["Target_01"]


def q_origin_http_paginated(spark, sf_dir):
    """HTTP Client origin over LIVE loopback HTTP — a local server exposes
    the first 200 events (ordered by event_id) as a ${startAt}-parameterised
    JSON API paged 50 at a time; the origin polls it BY_OFFSET with the
    default urllib transport (no fakes) and the page bodies are parsed and
    exploded distributed. Reference: basic-lib/.../origin/http/
    HttpClientSource.java (pagination: PaginationMode.java, offset
    arithmetic HttpClientSource.java:660-671)."""
    import json as _json
    import re as _re
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pyarrow.parquet as _pq

    from datacollector_spark.sources.http import http_client_origin_batch

    tbl = _pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["event_id"])[:200]

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            s = int(_re.search(r"startAt=(\d+)", self.path).group(1))
            body = _json.dumps(rows[s : s + 50]).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        df, _off = http_client_origin_batch(
            spark,
            f"http://127.0.0.1:{port}/api?startAt=${{startAt}}",
            "event_id long, event_type string, value double",
            pagination_mode="BY_OFFSET",
        )
    finally:
        # page bodies are already captured as parallelized literals — the
        # DataFrame never re-fetches, so the server can go away now
        httpd.shutdown()
        httpd.server_close()
        t.join(timeout=5)
    return df.select("page", "pos_in_page", "event_id", "event_type", "value")


def q_origin_s3_spool(spark, sf_dir):
    """Amazon S3 origin over a LIVE loopback S3-compatible endpoint: the
    first 120 customers land as 6 JSON-lines objects; the origin lists
    lexicographically, drains 4 objects, then RESUMES from the durable
    ``key::offset::eTag::timestamp`` offset for the remaining 2; object
    bodies are fetched by executors (mapInPandas), never the driver.
    Reference: aws-lib/.../origin/s3/AmazonS3Util.java:64-117 (marker
    listing), AbstractAmazonS3Source.java:246-295 (offset format). SigV4
    signature verification is pinned separately in tests/test_s3_origin.py
    (server-side recompute); this gate fake accepts the signed requests."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qsl, urlsplit

    import pyarrow.parquet as _pq

    from datacollector_spark.sources.s3 import S3ClientConfig, s3_spool_batch

    tbl = _pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["c_custkey"])[:120]
    objects = {}
    for chunk in range(6):
        body = "".join(
            _json.dumps(r) + "\n" for r in rows[chunk * 20 : (chunk + 1) * 20]
        ).encode()
        objects[f"in/cust-{chunk:02d}.jsonl"] = body

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            parts = urlsplit(self.path)
            segs = parts.path.lstrip("/").split("/", 1)
            if len(segs) > 1 and segs[1]:
                data = objects[segs[1]]
                self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            q = dict(parse_qsl(parts.query))
            after = q.get("continuation-token") or q.get("start-after", "")
            keys = sorted(
                k for k in objects if k.startswith(q.get("prefix", "")) and k > after
            )
            xml = ["<ListBucketResult>"]
            for k in keys:
                xml.append(
                    f"<Contents><Key>{k}</Key>"
                    "<LastModified>2026-01-01T00:00:00.000Z</LastModified>"
                    f"<ETag>&quot;e{k[-8:-6]}&quot;</ETag>"
                    f"<Size>{len(objects[k])}</Size></Contents>"
                )
            xml.append("<IsTruncated>false</IsTruncated></ListBucketResult>")
            data = "".join(xml).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    cfg = S3ClientConfig(
        f"http://127.0.0.1:{httpd.server_address[1]}", "AK", "SK"
    )
    try:
        df1, off = s3_spool_batch(
            spark, cfg, "b", "in/", "*.jsonl", max_objects=4, fetch_partitions=2
        )
        df2, _ = s3_spool_batch(
            spark, cfg, "b", "in/", "*.jsonl", last_offset=off, fetch_partitions=2
        )
        both = df1.unionByName(df2).select("key", "body").localCheckpoint()
    finally:
        httpd.shutdown()
        httpd.server_close()
        t.join(timeout=5)
    lines = both.select(
        "key",
        F.explode(F.split(F.col("body").cast("string"), "\n")).alias("line"),
    ).where(F.col("line") != "")
    return lines.select(
        "key",
        F.from_json(
            "line", "c_custkey long, c_name string, c_acctbal double"
        ).alias("r"),
    ).select("key", "r.*")


def q_origin_sdcipc(spark, sf_dir):
    """SDC RPC pipeline-to-pipeline over LIVE loopback: the first 150 orders
    are POSTed executor-side (`sdc_ipc_target`, snappy framed compression
    via the from-scratch codec) to a live `SdcIpcOrigin`, which validates
    app-id/content-type, decompresses, lands atomically, and reads back.
    Reference: basic-lib origin/sdcipc/IpcServlet.java + destination/sdcipc/
    SdcIpcTarget.java."""
    import tempfile

    from datacollector_spark.sources.sdcipc import SdcIpcOrigin, sdc_ipc_target

    src = (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(150)
        .repartition(4)
    )
    spool = tempfile.mkdtemp(prefix="sdcipc_gate_")
    origin = SdcIpcOrigin(spool, app_id="gate")
    try:
        sdc_ipc_target(
            src, [origin.host_port], "gate", compression=True, batch_size=32
        )
        back = origin.read(
            spark, schema="o_orderkey long, o_orderstatus string, o_totalprice double"
        ).localCheckpoint()
    finally:
        origin.stop()
    return back


def q_format_avro_ocf(spark, sf_dir):
    """AVRO data format end to end WITHOUT the spark-avro jar: events are
    written to Avro Object Container Files by the pure-Python spec codec
    (sources/avro_py.py — magic, metadata map, deflate blocks, sync markers)
    and read back DISTRIBUTED (binaryFile scan → mapInPandas decode, one
    task per file). Reference surface: commonlib/.../lib/parser/avro/
    AvroDataFileParser.java; the codec itself is pinned byte-for-byte to
    the public Avro spec's worked examples in tests/test_avro_py.py."""
    import json as _json
    import tempfile

    import pyarrow.parquet as _pq

    from datacollector_spark.sources.avro_py import read_avro_files, write_ocf

    schema = _json.dumps(
        {
            "type": "record",
            "name": "event",
            "fields": [
                {"name": "event_id", "type": "long"},
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                {"name": "event_type", "type": ["null", "string"]},
                {"name": "value", "type": "double"},
            ],
        }
    )
    rows = _pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "event_type", "value"]
    ).to_pylist()
    out_dir = tempfile.mkdtemp(prefix="avro_ocf_")
    n_files = 4
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        write_ocf(
            f"{out_dir}/part-{i}.avro", schema, rows[i * per : (i + 1) * per],
            codec="deflate",
        )
    return read_avro_files(spark, out_dir, schema).select(
        "event_id", "ts", "event_type", "value"
    )


def q_format_sdc_record(spark, sf_dir):
    """SDC_RECORD (SDC_JSON) — the reference's OWN record wire format
    (container/.../record/io/RecordWriterReaderFactory.java JSON1: magic
    0xA1 + one-line JSON FieldWithPath trees), implemented from scratch in
    sources/sdc_record.py.  Events round-trip through it end to end:
    executors write one stream per partition (foreachPartition, no driver
    data path), then a distributed binaryFile scan + Arrow-batched decode
    reads them back.  Timestamps truncate to millis on BOTH sides — SDC's
    DATETIME is java.util.Date epoch-millis by definition, and the oracle
    mirrors the truncation."""
    import tempfile

    from datacollector_spark.sources.sdc_record import (
        read_sdc_record_files,
        write_sdc_record_files,
    )

    df = (
        _t(spark, sf_dir, "events")
        .select(
            "event_id",
            F.date_trunc("millisecond", "ts").cast("timestamp_ntz").alias("ts"),
            "event_type",
            "value",
        )
        .repartition(4)
    )
    out_dir = tempfile.mkdtemp(prefix="sdc_record_")
    write_sdc_record_files(df, out_dir)
    return read_sdc_record_files(spark, out_dir, df.schema).select(
        "event_id", "ts", "event_type", "value"
    )


def q_origin_es_scroll(spark, sf_dir):
    """Elasticsearch origin over a LIVE loopback endpoint running the real
    sliced-scroll protocol: the first 200 orders are indexed as documents,
    then FOUR parallel scroll cursors (slice id/max in the search body,
    ``POST /_search/scroll`` pagination, ``DELETE`` at drain) pull them
    back — one executor task per slice, 25-hit pages, so every row moves
    executor-side (sources/elasticsearch.py; reference
    elasticsearch-protolib/.../ElasticsearchSource.java:263-271,292-321).
    Oracle = the same 200 orders straight from parquet."""
    import os
    import sys

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from datacollector_spark.sources.elasticsearch import (
        EsScrollConfig,
        es_scroll_batch,
    )

    try:
        from tests.esfake import FakeEs
    except ImportError:  # driver ran from another cwd — anchor on this file
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tests.esfake import FakeEs

    rows = sorted(
        _pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        ).to_pylist(),
        key=lambda r: r["o_orderkey"],
    )[:200]
    fake = FakeEs([(f"o{r['o_orderkey']}", r) for r in rows])
    fake.start()
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    cfg = EsScrollConfig(
        f"http://127.0.0.1:{fake.port}",
        "orders",
        num_slices=4,
        max_batch_size=25,
    )
    return es_scroll_batch(spark, cfg, schema).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_origin_rabbitmq(spark, sf_dir):
    """RabbitMQ round trip over a LIVE in-process broker speaking real
    AMQP 0-9-1 (tests/amqpfake.py; client = sources/rabbitmq.py, written
    against the public spec): the first 150 events publish through a
    fanout exchange from 3 executor partitions (content header + body
    frames, PLAIN handshake), then FOUR COMPETING consumer tasks
    basic.get-drain the queue with manual multiple-ack — the reference's
    RabbitSource manual-ack commit (RabbitSource.java:93-106) fanned out
    across executors.  Consumption is destructive, so the drained rows are
    materialized before returning (re-execution stability for the
    compare)."""
    import os
    import sys

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from datacollector_spark.sources.rabbitmq import (
        RabbitConfig,
        rabbit_origin_batch,
        rabbit_target,
    )

    try:
        from tests.amqpfake import FakeBroker
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tests.amqpfake import FakeBroker

    broker = FakeBroker()
    broker.start()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    cfg = RabbitConfig(
        uri=f"amqp://127.0.0.1:{broker.port}/",
        queue="events",
        exchanges=[{"name": "ex.events", "type": "fanout"}],
    )
    rows = sorted(
        _pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"],
        ).to_pylist(),
        key=lambda r: r["event_id"],
    )[:150]
    rabbit_target(
        spark.createDataFrame(rows, schema).repartition(3), cfg
    )
    drained = rabbit_origin_batch(spark, cfg, schema, consumers=4).select(
        "event_id", "event_type", "value"
    )
    return spark.createDataFrame(drained.collect(), drained.schema)


def q_origin_salesforce_bulk(spark, sf_dir):
    """Salesforce Bulk-API origin over a LIVE loopback endpoint running the
    real protocol (sources/salesforce.py — SOAP login envelope, XML
    job/batch lifecycle with the X-SFDC-Session header, Sforce-Enable-
    PKChunking): the first 180 orders are indexed as sobject rows, the
    PK-chunked query yields 4 server-split batches, and each (batch,
    result) pair's CSV is fetched by its own executor task — the
    reference's serial drain (ForceSource.bulkProduce) made
    embarrassingly parallel.  Oracle = the same 180 orders from
    parquet."""
    import os
    import sys

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from datacollector_spark.sources.salesforce import (
        ForceConfig,
        force_bulk_query,
    )

    try:
        from tests.sffake import FakeSalesforce
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tests.sffake import FakeSalesforce

    rows = sorted(
        _pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        ).to_pylist(),
        key=lambda r: r["o_orderkey"],
    )[:180]
    docs = [{"Id": f"{r['o_orderkey']:015d}", **r} for r in rows]
    fake = FakeSalesforce(docs)
    fake.start()
    cfg = ForceConfig(
        login_url=f"http://127.0.0.1:{fake.port}",
        username=fake.username,
        password=fake.password,
        soql_query=(
            "SELECT Id,o_orderkey,o_custkey,o_totalprice FROM Orders "
            "WHERE Id > '${offset}' ORDER BY Id"
        ),
        pk_chunk_size=50,
        # orderkey 0 exists, and its Id equals Salesforce's all-zero null
        # id (the ForceConfig default initial offset) — start strictly
        # below every real id instead
        initial_offset="",
    )
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    return force_bulk_query(spark, cfg, schema).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_origin_mongodb(spark, sf_dir):
    """MongoDB origin over a LIVE loopback mongod speaking real OP_MSG +
    BSON (tests/mongofake.py; client = sources/mongodb.py, codec pinned to
    the BSON spec's published bytes): 100 customers are seeded, range-
    partitioned across 4 executor tasks (driver probes only P-1 split
    VALUES — MongoDBSource.java prepareCursor made parallel), then 60 more
    land and a second drain RESUMES from the durable max-offset string —
    the union is the oracle's first 160."""
    import os
    import sys

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from datacollector_spark.sources.mongodb import (
        MongoSourceConfig,
        mongodb_next_offset,
        mongodb_read_batch,
    )

    try:
        from tests.mongofake import FakeMongod
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tests.mongofake import FakeMongod

    rows = sorted(
        _pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal"],
        ).to_pylist(),
        key=lambda r: r["c_custkey"],
    )[:160]
    docs = [
        {"ck": f"{r['c_custkey']:09d}", "c_name": r["c_name"],
         "c_acctbal": r["c_acctbal"]}
        for r in rows
    ]
    srv = FakeMongod()
    try:
        srv.seed("gate", "customers", docs[:100])
        cfg = MongoSourceConfig(
            "127.0.0.1", srv.port, "gate", "customers",
            offset_field="ck", offset_type="STRING",
            batch_size=30, num_partitions=4,
        )
        schema = T.StructType(
            [
                T.StructField("ck", T.StringType()),
                T.StructField("c_name", T.StringType()),
                T.StructField("c_acctbal", T.DoubleType()),
            ]
        )
        first = mongodb_read_batch(spark, cfg, schema)
        off = mongodb_next_offset(first, cfg)
        collected = first.collect()
        srv.seed("gate", "customers", docs[100:])
        delta = mongodb_read_batch(spark, cfg, schema, last_offset=off)
        collected += delta.collect()
        return spark.createDataFrame(collected, schema)
    finally:
        srv.close()


def q_sink_mongodb_cdc(spark, sf_dir):
    """MongoDB op-code-aware destination round trip
    (MongoDBTarget.java:120-212): an ordered CDC tape — INSERT the first
    120 customers, UPSERT the first 60 with doubled balances, DELETE the
    first 30 (full-document filters, carrying the post-upsert image) —
    applies through the ordered bulk wire commands; the surviving state is
    read BACK through the range-partitioned origin and must equal the
    oracle's replay: rows 31-120, balance doubled up to row 60."""
    import os
    import sys

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from datacollector_spark.model import OP_DELETE, OP_INSERT, OP_UPSERT
    from datacollector_spark.sources.mongodb import (
        MongoSourceConfig,
        MongoTargetConfig,
        mongodb_read_batch,
        mongodb_write,
    )

    try:
        from tests.mongofake import FakeMongod
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tests.mongofake import FakeMongod

    rows = sorted(
        _pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal"],
        ).to_pylist(),
        key=lambda r: r["c_custkey"],
    )[:120]
    tape = []
    for r in rows:
        tape.append((f"{r['c_custkey']:09d}", r["c_name"], r["c_acctbal"], OP_INSERT))
    for r in rows[:60]:
        tape.append(
            (f"{r['c_custkey']:09d}", r["c_name"], r["c_acctbal"] * 2, OP_UPSERT)
        )
    for r in rows[:30]:
        tape.append(
            (f"{r['c_custkey']:09d}", r["c_name"], r["c_acctbal"] * 2, OP_DELETE)
        )
    seq = [(i, *t) for i, t in enumerate(tape)]
    srv = FakeMongod()
    try:
        df = (
            spark.createDataFrame(
                seq, "seq long, ck string, c_name string, bal double, sdc_op int"
            )
            # one ordered partition: the reference applies a batch as ONE
            # ordered bulkWrite; cross-partition tapes pre-collapse per key
            .coalesce(1)
            .sortWithinPartitions("seq")
            .drop("seq")
        )
        tcfg = MongoTargetConfig(
            "127.0.0.1", srv.port, "gate", "state", unique_key_field="ck"
        )
        meters = mongodb_write(df, tcfg).collect()
        assert sum(m["errors"] for m in meters) == 0
        scfg = MongoSourceConfig(
            "127.0.0.1", srv.port, "gate", "state",
            offset_field="ck", offset_type="STRING", num_partitions=3,
        )
        schema = T.StructType(
            [
                T.StructField("ck", T.StringType()),
                T.StructField("c_name", T.StringType()),
                T.StructField("bal", T.DoubleType()),
            ]
        )
        final = mongodb_read_batch(spark, scfg, schema)
        return spark.createDataFrame(final.collect(), schema)
    finally:
        srv.close()


def q_cdc_mongo_oplog_tail(spark, sf_dir):
    """MongoDB OPLOG tail as a live CDC source (MongoDBOplogSource.java:
    100-160): an oplog-shaped capped collection (i/u/d entries with BSON
    ts timestamps, o/o2 update split) drains over the wire in 3 range
    partitions, decodes through ``decode_mongo_oplog`` (lossless ts ->
    (lsn, seq_in_tx) rescale), LWW-collapses per key, and the surviving
    state must equal the oracle's sequential replay: INSERT the first 100
    customers, UPDATE the first 50 to tripled balances, DELETE the first
    20."""
    import os
    import sys

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    from datacollector_spark.model import OP_DELETE
    from datacollector_spark.operators.collapse import lww_collapse
    from datacollector_spark.sources.changelog_formats import decode_mongo_oplog
    from datacollector_spark.sources.mongodb import (
        BsonTimestamp,
        MongoOplogConfig,
        mongodb_oplog_read_batch,
    )

    try:
        from tests.mongofake import FakeMongod
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tests.mongofake import FakeMongod

    rows = sorted(
        _pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal"],
        ).to_pylist(),
        key=lambda r: r["c_custkey"],
    )[:100]
    sec = 1_700_000_000
    entries = []
    for i, r in enumerate(rows):
        o = {
            "ck": f"{r['c_custkey']:09d}",
            "c_name": r["c_name"],
            "bal": str(r["c_acctbal"]),
        }
        entries.append(
            {"ts": BsonTimestamp(sec + i, 1), "op": "i", "ns": "db.cust",
             "o": o, "h": i}
        )
    for i, r in enumerate(rows[:50]):
        o = {
            "ck": f"{r['c_custkey']:09d}",
            "c_name": r["c_name"],
            "bal": str(r["c_acctbal"] * 3),
        }
        entries.append(
            {"ts": BsonTimestamp(sec + 1000 + i, 1), "op": "u", "ns": "db.cust",
             "o": o, "o2": {"ck": f"{r['c_custkey']:09d}"}, "h": 1000 + i}
        )
    for i, r in enumerate(rows[:20]):
        entries.append(
            {"ts": BsonTimestamp(sec + 2000 + i, 1), "op": "d", "ns": "db.cust",
             "o": {"ck": f"{r['c_custkey']:09d}"}, "h": 2000 + i}
        )
    srv = FakeMongod()
    try:
        srv.seed("local", "oplog.rs", entries)
        cfg = MongoOplogConfig("127.0.0.1", srv.port, num_partitions=3)
        raw = mongodb_oplog_read_batch(spark, cfg)
        env = decode_mongo_oplog(raw, "json")
        winners = lww_collapse(
            env.withColumn("ck", F.col("data")["ck"]),
            key_columns=["ck"],
            carry_columns=["op", "data"],
        )
        final = winners.where(F.col("op") != OP_DELETE).select(
            "ck",
            F.col("data")["c_name"].alias("c_name"),
            F.col("data")["bal"].cast("double").alias("bal"),
        )
        return spark.createDataFrame(final.collect(), final.schema)
    finally:
        srv.close()


def q_sdc_ported_cdc_lake(spark, sf_dir):
    """The day-one CDC acceptance path as a PORTED stock export: a
    binlog-origin → expression → field-remover → JdbcDTarget pipeline JSON
    goes through ``from_sdc_config`` (stage_overrides supply table_path +
    key_columns, standing in for the reference's runtime PK discovery),
    ``run_targets()`` collapses + MERGEs into the lake (COW, commit-key
    exactly-once), and the read-back snapshot must equal the sequential-
    replay oracle — the same SQL that gates the hand-wired
    ``cdc_lake_merge_final_state``."""
    from datacollector_spark.lake.table import LakeTable
    from datacollector_spark.plans.spec import PipelineSpec

    seg = tempfile.mkdtemp(prefix="dcs-ported-seg-")
    import os

    table_path = os.path.join(tempfile.mkdtemp(prefix="dcs-ported-lake-"), "t")
    _changelog(spark, sf_dir).write.mode("overwrite").parquet(seg)

    def _stage(name, klass, conf=None, ins=(), outs=()):
        return {
            "instanceName": name,
            "stageName": klass,
            "configuration": [
                {"name": k, "value": v} for k, v in (conf or {}).items()
            ],
            "inputLanes": list(ins),
            "outputLanes": list(outs),
        }

    config = {
        "pipelineConfig": {
            "title": "binlog-to-lake",
            "stages": [
                _stage(
                    "Binlog_01",
                    "com_streamsets_pipeline_stage_origin_mysql_MysqlBinLogDSource",
                    {},
                    outs=["L_raw"],
                ),
                _stage(
                    "Expr_01",
                    "com_streamsets_pipeline_stage_processor_expression_ExpressionDProcessor",
                    {
                        "expressionProcessorConfigs": [
                            {
                                "fieldToSet": "/text_len",
                                "expression": "${str:length(record:value('/text'))}",
                            }
                        ]
                    },
                    ins=["L_raw"],
                    outs=["L_x"],
                ),
                _stage(
                    "Remover_01",
                    "com_streamsets_pipeline_stage_processor_fieldfilter_FieldRemoverDProcessor",
                    {
                        "filterOperation": "REMOVE",
                        "fields": ["/text_len", "/old_role", "/old_text",
                                   "/old_tool", "/old_ts"],
                    },
                    ins=["L_x"],
                    outs=["L_clean"],
                ),
                _stage(
                    "Jdbc_01",
                    "com_streamsets_pipeline_stage_destination_jdbc_JdbcDTarget",
                    {
                        "hikariConfigBean.connectionString": "jdbc:mysql://db/x",
                        "tableNameTemplate": "transcripts",
                        "changeLogFormat": "MYSQL_BIN_LOG",
                        "defaultOperation": "INSERT",
                    },
                    ins=["L_clean"],
                ),
            ],
        }
    }
    spec = PipelineSpec.from_sdc_config(
        config,
        origin_overrides={"Binlog_01": {"path": seg}},
        stage_overrides={
            "Jdbc_01": {
                "table_path": table_path,
                "key_columns": ["conv_id", "turn_idx"],
            }
        },
    )
    spec.build(spark)
    spec.run_targets()
    return (
        LakeTable(spark, table_path)
        .read()
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def q_lookup_redis_kv(spark, sf_dir):
    """Redis KV lookup over a LIVE loopback RESP2 server: nation names are
    seeded as string keys, then every customer row looks up its nation via
    the from-scratch RESP client (sources/redis.py) — executors open one
    connection per task and collapse each Arrow batch's keys into chunked
    ``MGET`` pipelines (RedisStore.java:54-79 semantics, Jedis pipeline
    analog).  The fake answers genuine RESP2 wire bytes (``*N``/``$len``
    arrays, ``$-1`` nil for misses), so encoder and parser are both
    exercised; the oracle is the equivalent dimension join."""
    import socketserver
    import threading

    import pyarrow.parquet as _pq

    from datacollector_spark.sources.redis import redis_kv_lookup

    nations = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pylist()
    store = {f"nation-{r['n_nationkey']}": r["n_name"] for r in nations}

    class H(socketserver.StreamRequestHandler):
        def handle(self):
            while True:
                line = self.rfile.readline()
                if not line or not line.startswith(b"*"):
                    return
                args = []
                for _ in range(int(line[1:].strip())):
                    ln = int(self.rfile.readline()[1:].strip())
                    args.append(self.rfile.read(ln).decode())
                    self.rfile.read(2)
                if args and args[0].upper() == "MGET":
                    out = [b"*%d\r\n" % (len(args) - 1)]
                    for k in args[1:]:
                        v = store.get(k)
                        if v is None:
                            out.append(b"$-1\r\n")
                        else:
                            vb = v.encode()
                            out.append(b"$%d\r\n%s\r\n" % (len(vb), vb))
                    self.wfile.write(b"".join(out))
                else:
                    self.wfile.write(b"-ERR unsupported\r\n")

    class Srv(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Srv(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    keyed = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey").withColumn(
        "__redis_key",
        F.concat(F.lit("nation-"), F.col("c_nationkey").cast("string")),
    )
    return redis_kv_lookup(
        keyed, "__redis_key", f"redis://127.0.0.1:{port}", into="nation_name"
    ).select("c_custkey", "c_nationkey", "nation_name")


def q_proc_error_lane_headers(spark, sf_dir):
    """The error lane's record header as metadata columns — the columnar
    form of the reference's error-record header (RecordEL.java:245-292):
    precondition_filter(stage_name=...) attaches _error_stage/_error_code/
    _error_message, and the EL shim's record:errorCode()/errorStage()
    read them back (el_to_sql -> plain column references)."""
    from datacollector_spark.functions.el import el_expr
    from datacollector_spark.operators.processors import precondition_filter

    _, err = precondition_filter(
        _t(spark, sf_dir, "events"),
        "value >= 10",
        stage_name="Precondition_01",
    )
    return err.select(
        "event_id",
        el_expr("${record:errorStage()}").alias("err_stage"),
        el_expr("${record:errorCode()}").alias("err_code"),
        el_expr("${str:contains(record:errorMessage(), 'preconditions')}").alias(
            "is_precondition"
        ),
    )


def q_dedup_simhash(spark, sf_dir):
    from datacollector_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3, chunks=4
    )


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup detection over a corpus with PLANTED duplicates:
    each vector also appears x2-scaled under vec_id+100000 (cosine is scale
    invariant, and scaling by 2 commutes with fp rounding, so the planted
    pair is bit-identical in both engines). The LSH bucket self-join must
    recover exactly the planted pairs."""
    from datacollector_spark.operators.similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0).cast("float")).alias(
            "embedding"
        ),
    )
    return embedding_near_dup_pairs(
        emb.unionByName(dup), dim=64, threshold=0.95, planes=6
    ).select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_ann_cosine_topk(spark, sf_dir):
    from datacollector_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.where(F.col("vec_id") < 8), k=5).select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_ann_lsh_topk(spark, sf_dir):
    from datacollector_spark.operators.similarity import lsh_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_ann_topk(
        emb, emb.where(F.col("vec_id") < 8), dim=64, k=5, planes=6
    ).select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN — inverted lists under a coarse quantizer, the nprobe<nlist
    APPROXIMATE scale path (operators/similarity.ivf_ann_topk). The
    quantizer is deterministic at kmeans_iters=0 (seed centroids = the
    nlist smallest-id vectors), so the oracle recomputes assignment, probe
    selection, and candidate scoring exactly in SQL — an approximate-index
    result verified bit-for-bit, not just recall-checked."""
    from datacollector_spark.operators.similarity import ivf_ann_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_ann_topk(
        emb, emb.where(F.col("vec_id") < 8), dim=64, k=5, nlist=8, nprobe=2
    ).select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")


def q_corpus_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination (curation.decontaminate): docs with
    doc_id % 37 == 0 play the eval set; every remaining training doc is
    flagged if it shares any word 4-gram (production uses 13-grams; the
    synthetic corpus needs a smaller n to have signal). Join keys are
    md5-60bit shingle hashes, so the oracle reproduces the exact match
    set."""
    from datacollector_spark.operators.curation import decontaminate

    docs = _t(spark, sf_dir, "documents")
    out = decontaminate(
        docs.where(F.col("doc_id") % 37 != 0),
        docs.where(F.col("doc_id") % 37 == 0),
        n=4,
    )
    return out.select(
        "doc_id", "contaminated", F.col("n_matched").cast("long").alias("n_matched")
    )


def q_corpus_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum rate sampling (curation.stratified_sample,
    fraction mode): training-mix construction by language with hash-
    threshold membership — rerun-stable, growth-stable, zero shuffles."""
    from datacollector_spark.operators.curation import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        "lang",
        fractions={"en": 0.5, "de": 1.0, "fr": 0.25},
        default_fraction=0.1,
        salt="mix-v1",
    ).select("doc_id", "lang")


def q_corpus_stratified_take(spark, sf_dir):
    """Deterministic reservoir (stratified_sample exact_n mode): the N
    smallest-(hash,id) rows per stratum — exact per-source quotas for a
    training mix, reproducible across engines."""
    from datacollector_spark.operators.curation import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        "source",
        exact_n={"src0": 5, "src1": 3},
    ).select("doc_id", "source")


def q_ann_ivf_index_search(spark, sf_dir):
    """Persisted-IVF search (similarity.build_ivf_index/ivf_index_search):
    the inverted lists live as cid-partitioned parquet and the probe set
    becomes a literal partition filter — un-probed lists are never opened.
    Same deterministic quantizer as ann_ivf_topk, so the SAME SQL oracle
    must match bit-for-bit (the on-disk path proven equal to the inline
    operator AND to the relational definition)."""
    import tempfile

    from datacollector_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_search,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = tempfile.mkdtemp(prefix="dcs_ivf_idx_")
    build_ivf_index(emb, idx, dim=64, nlist=8)
    return ivf_index_search(
        spark, idx, emb.where(F.col("vec_id") < 8), k=5, nprobe=2
    ).select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")


def q_emb_truncate_renorm(spark, sf_dir):
    """Matryoshka truncation (similarity.truncate_embeddings): first-16-dim
    prefix, L2-renormalized — per-row first/last components and the
    pre-normalization norm checked against the SQL definition (left-assoc
    sum of squares both engines)."""
    from datacollector_spark.operators.similarity import (
        l2_norm,
        truncate_embeddings,
    )

    out = truncate_embeddings(_t(spark, sf_dir, "embeddings"), dim_out=16)
    pre = l2_norm(F.slice(F.col("embedding").cast("array<double>"), 1, 16))
    return out.select(
        "vec_id",
        F.round(F.col("embedding_trunc")[0], 6).alias("c_first"),
        F.round(F.col("embedding_trunc")[15], 6).alias("c_last"),
        F.round(pre, 6).alias("pre_norm"),
    )


def q_corpus_pack_sequences(spark, sf_dir):
    """Deterministic contiguous sequence packing (curation.pack_sequences):
    documents laid out in an md5-hash global order and binned by cumulative
    token budget — the training-batch construction step. The engine runs a
    DISTRIBUTED two-level prefix sum (range-bucket windows + a broadcast
    bucket-prefix join, never a single-partition global window); the oracle
    is the plain global window, so the gate proves the distributed
    decomposition exactly equals the sequential definition."""
    from datacollector_spark.operators.curation import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"), token_col="n_chars", budget=10_000
    ).select("doc_id", "pack_order", "pack_bin", "pack_offset")


def q_text_chunk_documents(spark, sf_dir):
    """Overlapping context-window chunking (text.chunk_documents): chunk i
    = words [i*stride, i*stride+max_tokens), stride = max_tokens - overlap
    — one JVM projection + map-side posexplode, zero shuffles."""
    from datacollector_spark.operators.text import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), max_tokens=24, overlap=8
    )


def q_text_quality(spark, sf_dir):
    from datacollector_spark.operators.text import quality_features

    df = quality_features(_t(spark, sf_dir, "documents"))
    return df.select(
        "doc_id",
        "n_tokens",
        "n_subtokens",
        "stopword_hits",
        F.round("uniq_token_ratio", 4).alias("uniq_token_ratio"),
        F.round("quality_score", 4).alias("quality_score"),
    )


def q_text_lang_id(spark, sf_dir):
    from datacollector_spark.operators.text import lang_id

    return (
        _t(spark, sf_dir, "documents")
        .select(lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_text_fingerprint(spark, sf_dir):
    from datacollector_spark.operators.text import fingerprint

    return _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )


def q_text_cdc_chunks(spark, sf_dir):
    """Rolling-hash content-defined chunk boundaries (fuzzy-diff building
    block, operators/text.content_defined_chunks): md5-derived window hash,
    boundary where the low mask_bits are zero — reproducible in SQL."""
    from datacollector_spark.operators.text import content_defined_chunks

    ch = content_defined_chunks(F.col("text"), window=16, mask_bits=6)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(ch).cast("long").alias("n_chunks"),
        F.try_element_at(ch, F.lit(1)).cast("long").alias("first_boundary"),
    )


def q_multimodal_image_features(spark, sf_dir):
    from datacollector_spark.operators.multimodal import (
        extract_image_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n=256)
    feats = extract_image_features(media, dim=16)
    return feats.select(
        "media_id",
        "feat_dim",
        "decode_ok",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 4).alias(
            "feat_sum"
        ),
    )


def q_multimodal_frame_sampling(spark, sf_dir):
    from datacollector_spark.operators.multimodal import (
        sample_video_frames,
        synthesize_media,
    )

    return sample_video_frames(synthesize_media(spark, n=256), every_ms=1000)


def q_origin_http_push(spark, sf_dir):
    """HTTP Server push origin over a LIVE listener (sources/http.
    HttpServerOrigin; reference basic-lib/.../origin/httpserver/
    HttpServerPushSource.java + PushHttpReceiver.java): the first 150
    events are POSTed from 3 executor partitions as gzip-compressed
    JSON-lines bodies (X-SDC-APPLICATION-ID validated, X-SDC-COMPRESSION
    decompressed server-side), each landing atomically in the spool, then
    read back distributed through the same file source the streaming
    pipeline uses."""
    import tempfile

    from pyspark.sql import types as T

    from datacollector_spark.sources.http import HttpServerOrigin
    from datacollector_spark.sources.spooldir import spool_dir_batch

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = (
        _t(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
        .limit(150)
        .repartition(3)
    )
    spool = tempfile.mkdtemp(prefix="httppush_gate_")
    origin = HttpServerOrigin(spool, app_id="gate")
    url, app = origin.url, "gate"

    def post_partition(rows):
        import gzip as _gzip
        import json as _json
        import urllib.request as _rq

        lines = [
            _json.dumps(
                {"event_id": r.event_id, "event_type": r.event_type, "value": r.value}
            )
            for r in rows
        ]
        if not lines:
            return
        body = _gzip.compress(("\n".join(lines) + "\n").encode())
        req = _rq.Request(
            url,
            data=body,
            headers={
                "X-SDC-APPLICATION-ID": app,
                "X-SDC-COMPRESSION": "gzip",
                "Content-Type": "application/json",
            },
            method="POST",
        )
        with _rq.urlopen(req, timeout=30) as resp:
            assert resp.status == 200

    try:
        src.foreachPartition(post_partition)
    finally:
        origin.stop()
    return spool_dir_batch(
        spark, spool, schema=schema, file_format="json"
    ).localCheckpoint()


def q_origin_websocket_push(spark, sf_dir):
    """WebSocket Server push origin over a LIVE RFC 6455 listener
    (sources/http.WebSocketServerOrigin; reference basic-lib/.../origin/
    websocketserver/WebSocketServerPushSource.java + PushWebSocketReceiver
    .java): the first 120 events are sent from 3 executor partitions, each
    partition opening its own socket, handshaking (Sec-WebSocket-Accept
    verified client-side), and pushing its rows as ONE masked text message
    of JSON lines — the first fragmented across a continuation frame to
    exercise reassembly. The close handshake is the fence: the server
    processes frames in order, so the echoed close proves the message
    landed before stop()."""
    import tempfile

    from pyspark.sql import types as T

    from datacollector_spark.sources.http import WebSocketServerOrigin
    from datacollector_spark.sources.spooldir import spool_dir_batch

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = (
        _t(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
        .limit(120)
        .repartition(3)
    )
    spool = tempfile.mkdtemp(prefix="wspush_gate_")
    origin = WebSocketServerOrigin(spool, app_id="gate")
    host, port, app = origin.host, origin.port, "gate"

    def send_partition(rows):
        import base64 as _b64
        import hashlib as _hl
        import json as _json
        import socket as _sock

        lines = [
            _json.dumps(
                {"event_id": r.event_id, "event_type": r.event_type, "value": r.value}
            )
            for r in rows
        ]
        if not lines:
            return

        def frame(payload, opcode=0x1, fin=True, mask=b"\x37\xfa\x21\x3d"):
            head = bytes([(0x80 if fin else 0) | opcode])
            n = len(payload)
            if n < 126:
                head += bytes([0x80 | n])
            elif n < 1 << 16:
                head += bytes([0x80 | 126]) + n.to_bytes(2, "big")
            else:
                head += bytes([0x80 | 127]) + n.to_bytes(8, "big")
            return head + mask + bytes(b ^ mask[i % 4] for i, b in enumerate(payload))

        key = "dGhlIHNhbXBsZSBub25jZQ=="
        s = _sock.create_connection((host, port), timeout=30)
        try:
            s.sendall(
                (
                    "GET / HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                    f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                    "Sec-WebSocket-Version: 13\r\n"
                    f"X-SDC-APPLICATION-ID: {app}\r\n\r\n"
                ).encode()
            )
            resp = b""
            while b"\r\n\r\n" not in resp:
                chunk = s.recv(4096)
                if not chunk:
                    raise IOError("handshake EOF")
                resp += chunk
            expect = _b64.b64encode(
                _hl.sha1((key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()).digest()
            ).decode()
            assert f"Sec-WebSocket-Accept: {expect}".encode() in resp
            body = ("\n".join(lines) + "\n").encode()
            # fragment: text FIN=0 + continuation FIN=1 (reassembly path)
            s.sendall(frame(body[: len(body) // 2], opcode=0x1, fin=False))
            s.sendall(frame(body[len(body) // 2 :], opcode=0x0, fin=True))
            s.sendall(frame(b"", opcode=0x8))  # close = ordering fence
            assert s.recv(16)[:1] == b"\x88"
        finally:
            s.close()

    try:
        src.foreachPartition(send_partition)
    finally:
        origin.stop()
    return spool_dir_batch(
        spark, spool, schema=schema, file_format="json"
    ).localCheckpoint()


def q_format_syslog_datagram(spark, sf_dir):
    """DATAGRAM format, syslog mode (basic-lib/.../origin/udp/UDPSource.java
    fast path; commonlib syslog parse): every event row is rendered as an
    RFC 3164 datagram line (<pri>ts host app[pid]: msg) and parsed back
    JVM-side with parse_log + SYSLOG_PATTERN — facility/severity recovered
    from the priority octet. Stays entirely in whole-stage codegen (concat
    + regexp_extract), no Python in the hot path."""
    from datacollector_spark.sources.formats import (
        SYSLOG_GROUPS,
        SYSLOG_PATTERN,
        parse_log,
    )

    e = _t(spark, sf_dir, "events")
    datagrams = e.select(
        F.concat(
            F.lit("<"),
            F.pmod("event_id", F.lit(191)).cast("string"),
            F.lit(">Mar 15 10:00:00 host-"),
            F.pmod("event_id", F.lit(50)).cast("string"),
            F.lit(" "),
            F.col("event_type"),
            F.lit("["),
            F.col("event_id").cast("string"),
            F.lit("]: ev "),
            F.col("event_type"),
        ).alias("line")
    )
    parsed = parse_log(datagrams, "line", SYSLOG_PATTERN, SYSLOG_GROUPS)
    return parsed.select(
        F.col("pid").cast("long").alias("event_id"),
        (F.col("pri").cast("int") / 8).cast("int").alias("facility"),
        F.pmod(F.col("pri").cast("int"), F.lit(8)).alias("severity"),
        F.col("host"),
        F.col("app"),
        F.col("message"),
    )


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full CDC path (derive changelog -> LWW collapse ->
    MERGE into a bucketed lake table -> read committed snapshot)."""
    return q_cdc_lake_merge_final_state(spark, SF001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_lww_final_state": q_cdc_lww_final_state,
        "cdc_lake_merge_final_state": q_cdc_lake_merge_final_state,
        "cdc_mor_final_state": q_cdc_mor_final_state,
        "cdc_op_decode": q_cdc_op_decode,
        "cdc_dedup_rate": q_cdc_dedup_rate,
        "proc_stream_selector": q_proc_stream_selector,
        "proc_precondition_filter": q_proc_precondition_filter,
        "proc_expression_evaluator": q_proc_expression_evaluator,
        "proc_field_type_converter": q_proc_field_type_converter,
        "proc_field_masker": q_proc_field_masker,
        "proc_field_hasher": q_proc_field_hasher,
        "proc_field_splitter": q_proc_field_splitter,
        "proc_value_replacer": q_proc_value_replacer,
        "proc_list_pivot": q_proc_list_pivot,
        "proc_json_parser": q_proc_json_parser,
        "proc_base64": q_proc_base64,
        "proc_scripting_pandas": q_proc_scripting_pandas,
        "proc_spark_evaluator": q_proc_spark_evaluator,
        "proc_log_parser": q_proc_log_parser,
        "format_csv_roundtrip": q_format_csv_roundtrip,
        "proc_record_dedup": q_proc_record_dedup,
        "proc_record_dedup_split": q_proc_record_dedup_split,
        "lookup_broadcast_dim": q_lookup_broadcast_dim,
        "lookup_static_kv": q_lookup_static_kv,
        "lookup_ip_range": q_lookup_ip_range,
        "lookup_split_multiplicity": q_lookup_split_multiplicity,
        "agg_metrics_rollup": q_agg_metrics_rollup,
        "window_topk_per_key": q_window_topk_per_key,
        "window_tumbling_counts": q_window_tumbling_counts,
        "window_session_counts": q_window_session_counts,
        "framework_fan_in": q_framework_fan_in,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "tpch_top_orders": q_tpch_top_orders,
        "dedup_exact_documents": q_dedup_exact_documents,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_components": q_dedup_components,
        "dedup_components_star": q_dedup_components_star,
        "dedup_simhash": q_dedup_simhash,
        "el_ported_config": q_el_ported_config,
        "el_ported_config_2": q_el_ported_config_2,
        "sdc_ported_dedup_fanin": q_sdc_ported_dedup_fanin,
        "origin_http_paginated": q_origin_http_paginated,
        "origin_http_push": q_origin_http_push,
        "origin_websocket_push": q_origin_websocket_push,
        "format_syslog_datagram": q_format_syslog_datagram,
        "origin_s3_spool": q_origin_s3_spool,
        "origin_sdcipc": q_origin_sdcipc,
        "format_avro_ocf": q_format_avro_ocf,
        "format_sdc_record": q_format_sdc_record,
        "origin_es_scroll": q_origin_es_scroll,
        "origin_rabbitmq": q_origin_rabbitmq,
        "origin_salesforce_bulk": q_origin_salesforce_bulk,
        "sdc_ported_cdc_lake": q_sdc_ported_cdc_lake,
        "origin_mongodb": q_origin_mongodb,
        "sink_mongodb_cdc": q_sink_mongodb_cdc,
        "cdc_mongo_oplog_tail": q_cdc_mongo_oplog_tail,
        "lookup_redis_kv": q_lookup_redis_kv,
        "proc_error_lane_headers": q_proc_error_lane_headers,
        "el_dir_template": q_el_dir_template,
        "corpus_hash_split": q_corpus_hash_split,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "corpus_decontaminate": q_corpus_decontaminate,
        "corpus_stratified_sample": q_corpus_stratified_sample,
        "corpus_stratified_take": q_corpus_stratified_take,
        "ann_ivf_index_search": q_ann_ivf_index_search,
        "emb_truncate_renorm": q_emb_truncate_renorm,
        "corpus_pack_sequences": q_corpus_pack_sequences,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "text_cdc_chunks": q_text_cdc_chunks,
        "text_chunk_documents": q_text_chunk_documents,
        "multimodal_image_features": q_multimodal_image_features,
        "multimodal_frame_sampling": q_multimodal_frame_sampling,
    }


def oracle_sql() -> dict[str, str]:
    langs = {"de": None, "en": None, "es": None, "fr": None}
    try:
        from datacollector_spark.operators.text import LANG_MARKERS as _LM

        markers = {k: _LM[k] for k in sorted(_LM)}
    except Exception:  # pragma: no cover
        markers = langs

    def hits(lang):
        lst = ", ".join(f"'{w}'" for w in markers[lang])
        return (
            f"len(list_filter([{lst}], m -> list_contains("
            "list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')), m)))"
        )

    lang_case = (
        "CASE "
        + " ".join(
            f"WHEN h_{lang} >= 1 AND h_{lang} = greatest(h_de, h_en, h_es, h_fr) "
            f"THEN '{lang}'"
            for lang in ["de", "en", "es", "fr"]
        )
        + " ELSE 'und' END"
    )

    return {
        "cdc_lww_final_state": f"""
            WITH {_LWW_CTE}
            SELECT conv_id, turn_idx, text, lsn
            FROM last_per_key WHERE op != 2
        """,
        "cdc_lake_merge_final_state": f"""
            WITH {_LWW_CTE}
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM last_per_key WHERE op != 2
        """,
        "cdc_mor_final_state": f"""
            WITH {_LWW_CTE}
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM last_per_key WHERE op != 2
        """,
        "cdc_op_decode": f"""
            WITH {_CHANGELOG_CTE}
            SELECT CASE op WHEN 1 THEN 'INSERT' WHEN 2 THEN 'DELETE'
                           WHEN 3 THEN 'UPDATE' ELSE 'UNSUPPORTED' END AS op_name,
                   count(*) AS n
            FROM changelog GROUP BY 1
        """,
        "cdc_dedup_rate": f"""
            WITH {_CHANGELOG_CTE}
            SELECT count(*) AS n_delivered,
                   count(DISTINCT (lsn, seq_in_tx)) AS n_logical,
                   count(*) - count(DISTINCT (lsn, seq_in_tx)) AS n_duplicates
            FROM changelog
        """,
        "proc_stream_selector": """
            SELECT lane, count(*) AS n FROM (
              SELECT CASE WHEN event_type = 'error' THEN 'errors'
                          WHEN value >= 900 THEN 'high'
                          ELSE 'rest' END AS lane
              FROM events) GROUP BY lane
        """,
        "proc_precondition_filter": """
            SELECT event_type,
                   CAST(sum(CASE WHEN value >= 100 AND props IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
                   CAST(sum(CASE WHEN value >= 100 AND props IS NOT NULL
                            THEN 0 ELSE 1 END) AS BIGINT) AS n_error
            FROM events GROUP BY event_type
        """,
        "proc_expression_evaluator": """
            SELECT l_returnflag,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "proc_field_type_converter": """
            SELECT CAST(o_orderkey AS VARCHAR) AS okey_str,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
                   strftime(o_orderdate, '%Y-%m') AS order_month
            FROM orders
        """,
        "proc_field_masker": """
            SELECT c_custkey, regexp_replace(c_name, '.', 'x', 'g') AS masked_name
            FROM customer
        """,
        "proc_field_hasher": """
            SELECT c_custkey,
                   md5(c_name || chr(31) || c_mktsegment) AS rec_hash
            FROM customer
        """,
        "proc_field_splitter": """
            SELECT NULLIF(split_part(p_type, ' ', 1), '') AS t1,
                   NULLIF(split_part(p_type, ' ', 2), '') AS t2,
                   count(*) AS n
            FROM part GROUP BY 1, 2
        """,
        "proc_value_replacer": """
            SELECT c_custkey,
                   ROUND(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END, 2)
                     AS acctbal_floor
            FROM customer
        """,
        "proc_list_pivot": """
            SELECT word, count(*) AS n FROM (
              SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
            GROUP BY word
        """,
        "proc_json_parser": """
            SELECT event_id, CAST(props::JSON->>'k' AS INT) AS k FROM events
        """,
        "proc_base64": """
            SELECT c_custkey, base64(CAST(c_name AS BLOB)) AS name_b64 FROM customer
        """,
        "proc_scripting_pandas": """
            SELECT doc_id, CAST(length(text) AS INT) AS text_len FROM documents
        """,
        "proc_spark_evaluator": """
            WITH src AS (SELECT o_orderkey, o_totalprice FROM orders)
            SELECT CAST(FLOOR(o_totalprice / 50000) AS INT) AS band,
                   COUNT(*) AS n
            FROM src WHERE o_totalprice >= 150000 GROUP BY 1
            UNION ALL
            SELECT CAST(-1 AS INT) AS band, COUNT(*) AS n
            FROM src WHERE o_totalprice < 150000
        """,
        "proc_log_parser": """
            WITH raw AS (
              SELECT event_id,
                     'host-' || CAST(user_id AS VARCHAR) || ' "GET /' ||
                     event_type || '" ' ||
                     CAST((event_id % 5) * 100 + 200 AS VARCHAR) AS raw
              FROM events)
            SELECT event_id,
                   regexp_extract(raw, '^(\\S+) "(\\S+) (\\S+)" (\\d{3})$', 1) AS host,
                   regexp_extract(raw, '^(\\S+) "(\\S+) (\\S+)" (\\d{3})$', 2) AS method,
                   regexp_extract(raw, '^(\\S+) "(\\S+) (\\S+)" (\\d{3})$', 3) AS path,
                   regexp_extract(raw, '^(\\S+) "(\\S+) (\\S+)" (\\d{3})$', 4) AS status
            FROM raw
        """,
        "format_csv_roundtrip": """
            SELECT event_id,
                   event_type || ',' || CAST(user_id AS VARCHAR) AS line,
                   event_type AS et, user_id AS uid
            FROM events
        """,
        "proc_record_dedup": """
            SELECT min(event_id) AS event_id, user_id, event_type,
                   count(*) AS dup_count
            FROM events GROUP BY user_id, event_type
        """,
        "proc_record_dedup_split": """
            SELECT event_id, user_id, event_type, value,
                   CASE WHEN row_number() OVER (
                       PARTITION BY user_id, event_type ORDER BY event_id
                   ) = 1 THEN 'unique' ELSE 'duplicate' END AS lane
            FROM events
        """,
        "lookup_split_multiplicity": """
            SELECT n.n_nationkey, n.n_name, s.s_name, s.s_acctbal
            FROM nation n
            LEFT JOIN (
                SELECT s_nationkey, s_name, round(s_acctbal, 2) AS s_acctbal
                FROM supplier
            ) s ON s.s_nationkey = n.n_nationkey
        """,
        "lookup_broadcast_dim": """
            SELECT p_brand,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS brand_revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "lookup_static_kv": """
            SELECT n_nationkey, n_name, r_name AS region_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "lookup_ip_range": """
            WITH facts AS (
              SELECT event_id, (event_id * 2654435761) % 1000 AS ip FROM events),
            ranges(lo, hi, geo) AS (VALUES
              (0, 249, 'apac'), (250, 499, 'emea'),
              (500, 749, 'amer'), (750, 999, 'latam'))
            SELECT geo, count(*) AS n
            FROM facts LEFT JOIN ranges ON ip BETWEEN lo AND hi
            GROUP BY geo
        """,
        "agg_metrics_rollup": """
            SELECT event_type, count(*) AS n,
                   ROUND(SUM(value), 4) AS sum_value,
                   ROUND(AVG(value), 4) AS avg_value,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM events GROUP BY event_type
        """,
        "window_topk_per_key": """
            SELECT user_id, event_id, value, rank FROM (
              SELECT user_id, event_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rank
              FROM events) WHERE rank <= 3
        """,
        "window_tumbling_counts": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n, ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "window_session_counts": """
            WITH marked AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               > INTERVAL 30 MINUTE OR
                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          THEN 1 ELSE 0 END AS new_session
              FROM events),
            sessions AS (
              SELECT user_id, event_id,
                     SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked)
            SELECT user_id, min(event_id) AS first_event, count(*) AS n
            FROM sessions GROUP BY user_id, sid
        """,
        "framework_fan_in": """
            SELECT CASE WHEN value >= 500 THEN 'high' ELSE 'low' END AS lane,
                   event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_top_orders": """
            SELECT l_orderkey, ROUND(_rev, 2) AS revenue, rank FROM (
              SELECT l_orderkey, _rev,
                     row_number() OVER (ORDER BY _rev DESC, l_orderkey) AS rank
              FROM (
                SELECT l_orderkey,
                       SUM(l_extendedprice * (1 - l_discount)) AS _rev
                FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                WHERE c_mktsegment = 'BUILDING'
                GROUP BY l_orderkey))
            WHERE rank <= 10
        """,
        "dedup_exact_documents": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM documents GROUP BY text
        """,
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLE_CTE},
            capped AS (
              SELECT doc_id, s FROM shingles
              WHERE s IN (SELECT s FROM shingles GROUP BY s HAVING count(*) <= 100)),
            sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id),
            shared AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
              FROM capped a JOIN capped b
                ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
            FROM shared
            JOIN sizes na ON na.doc_id = id_a
            JOIN sizes nb ON nb.doc_id = id_b
            WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.4
        """,
        "ann_cosine_topk": """
            SELECT query_id, neighbor_id, ROUND(cos, 6) AS cosine, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])) AS cos,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                         CAST(q.embedding AS DOUBLE[]),
                         CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
              FROM embeddings q, embeddings c
              WHERE q.vec_id < 8 AND c.vec_id != q.vec_id)
            WHERE rank <= 5
        """,
        "ann_ivf_topk": _IVF_ORACLE,
        # the persisted-index path must land on the SAME result as the
        # inline operator — one oracle proves both equal the relational
        # definition of the deterministic quantizer
        "ann_ivf_index_search": _IVF_ORACLE,
        "corpus_decontaminate": f"""
            WITH docs AS (
              SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS w
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 3), ' ') AS s
              FROM docs, UNNEST(generate_series(1, len(w) - 3)) AS t(i)
              WHERE len(w) >= 4
              UNION
              SELECT DISTINCT doc_id, array_to_string(w, ' ') AS s
              FROM docs WHERE len(w) < 4),
            hashed AS (
              SELECT doc_id, {_MD5LONG.format(x='s')} AS h FROM sh),
            bench AS (SELECT DISTINCT h FROM hashed WHERE doc_id % 37 = 0),
            matched AS (
              SELECT c.doc_id, count(DISTINCT c.h) AS n_matched
              FROM hashed c JOIN bench b ON c.h = b.h
              WHERE c.doc_id % 37 != 0 GROUP BY 1)
            SELECT d.doc_id,
                   COALESCE(m.n_matched, 0) > 0 AS contaminated,
                   CAST(COALESCE(m.n_matched, 0) AS BIGINT) AS n_matched
            FROM documents d LEFT JOIN matched m ON d.doc_id = m.doc_id
            WHERE d.doc_id % 37 != 0
        """,
        "corpus_stratified_sample": f"""
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                CAST({_md5_salt_sql("doc_id", "mix-v1")} AS DOUBLE)
                  / {float(1 << 60)!r} AS u
              FROM documents)
            WHERE u < (CASE lang WHEN 'de' THEN {1.0!r} WHEN 'en' THEN {0.5!r}
                       WHEN 'fr' THEN {0.25!r} ELSE {0.1!r} END)
        """,
        "corpus_stratified_take": f"""
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                row_number() OVER (PARTITION BY source
                  ORDER BY {_md5_salt_sql("doc_id", "sample-v1")}, doc_id) AS rn
              FROM documents)
            WHERE rn <= (CASE source WHEN 'src0' THEN 5
                         WHEN 'src1' THEN 3 ELSE 0 END)
        """,
        "emb_truncate_renorm": """
            SELECT vec_id,
                   ROUND(p[1] / nrm, 6) AS c_first,
                   ROUND(p[16] / nrm, 6) AS c_last,
                   ROUND(nrm, 6) AS pre_norm
            FROM (
              SELECT vec_id, p,
                     sqrt(list_reduce(list_transform(p, x -> x*x),
                                      (a, b) -> a + b)) AS nrm
              FROM (SELECT vec_id, CAST(embedding AS DOUBLE[])[1:16] AS p
                    FROM embeddings))
        """,
        "corpus_pack_sequences": f"""
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT)
                     AS pack_order,
                   CAST(off // 10000 AS BIGINT) AS pack_bin,
                   CAST(off AS BIGINT) AS pack_offset
            FROM (
              SELECT doc_id, h,
                     COALESCE(SUM(n_chars) OVER (
                       ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS off
              FROM (SELECT doc_id, n_chars,
                           {_md5_salt_sql("doc_id", "pack-v1")} AS h
                    FROM documents))
        """,
        "text_quality": f"""
            WITH feat AS (
              SELECT doc_id,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                END AS n_tokens,
                CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_subtokens,
                CAST({hits('en')} AS INT) AS stopword_hits,
                len(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')))
                  AS n_uniq,
                length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS n_punct,
                length(text) AS n_chars
              FROM documents)
            SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, n_subtokens,
                   stopword_hits,
                   ROUND(CAST(n_uniq AS DOUBLE) / greatest(n_tokens, 1), 4)
                     AS uniq_token_ratio,
                   ROUND(CASE WHEN n_tokens < 5 THEN 0.0 ELSE least(1.0,
                     0.25 * least(1.0, n_tokens / 50.0)
                     + 0.25 * least(1.0, stopword_hits / 4.0)
                     + 0.25 * (CAST(n_uniq AS DOUBLE) / greatest(n_tokens, 1))
                     + 0.25 * (1.0 - least(1.0,
                         (CAST(n_punct AS DOUBLE) / greatest(n_chars, 1)) * 5.0)))
                   END, 4) AS quality_score
            FROM feat
        """,
        "text_lang_id": f"""
            SELECT lang_pred, count(*) AS n FROM (
              SELECT {lang_case} AS lang_pred FROM (
                SELECT {hits('de')} AS h_de, {hits('en')} AS h_en,
                       {hits('es')} AS h_es, {hits('fr')} AS h_fr, text
                FROM documents))
            GROUP BY lang_pred
        """,
        "text_fingerprint": f"""
            WITH {_SHINGLE_CTE}
            SELECT doc_id, min({_MD5LONG.format(x='s')}) AS fp
            FROM shingles GROUP BY doc_id
        """,
        "text_chunk_documents": """
            SELECT doc_id,
                   CAST(i AS INT) AS chunk_idx,
                   array_to_string(w2, ' ') AS chunk_text,
                   CAST(len(w2) AS INT) AS chunk_tokens
            FROM (
              SELECT doc_id, i,
                     list_slice(w, CAST(i*16+1 AS BIGINT),
                                CAST(i*16+24 AS BIGINT)) AS w2
              FROM (SELECT doc_id,
                           regexp_split_to_array(trim(text), '\\s+') AS w
                    FROM documents),
                   UNNEST(generate_series(0,
                     CAST(greatest(ceil((len(w) - 8) / 16.0), 1) AS BIGINT)
                       - 1)) t(i))
        """,
        "text_cdc_chunks": f"""
            SELECT doc_id,
                   len(b) AS n_chunks,
                   b[1] AS first_boundary
            FROM (
              SELECT doc_id,
                     list_filter(
                       list_transform(
                         generate_series(1, greatest(length(text) - 16, 1)),
                         i -> CASE WHEN ({_MD5LONG.format(x='substr(text, CAST(i AS INTEGER), 16)')} & 63) = 0
                              THEN i END
                       ),
                       x -> x IS NOT NULL
                     ) AS b
              FROM documents
            )
        """,
        "dedup_embedding_cosine": _embedding_neardup_oracle(dim=64, planes=6, threshold=0.95),
        "dedup_minhash_lsh": _minhash_lsh_oracle(num_hashes=32, bands=8, threshold=0.4),
        "dedup_components": _components_oracle(num_hashes=32, bands=8, threshold=0.4),
        # the star variant must land on the SAME fixpoint as min-label —
        # one oracle proves both implementations pointwise equal
        "dedup_components_star": _components_oracle(num_hashes=32, bands=8, threshold=0.4),
        "el_ported_config": """
            SELECT event_id, ts, user_id, event_type, value, props,
                   upper(event_type) AS etype_up,
                   substr(event_type, 1, 3) AS marker,
                   event_id % 10 AS eid_bucket
            FROM events
            WHERE event_type = 'click' AND NOT (value < 10.0)
        """,
        "el_ported_config_2": """
            SELECT event_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts,
                   user_id,
                   COALESCE(event_type, 'unknown') AS event_type,
                   CASE WHEN value > 400 THEN 400.0 ELSE value END AS value,
                   regexp_replace(props, '.', 'x', 'g') AS props,
                   CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS pj_k,
                   event_type AS etype_part,
                   CAST(event_id % 10 AS VARCHAR) AS bucket_part,
                   CASE event_type
                        WHEN 'click' THEN 'Click Event'
                        WHEN 'view' THEN 'View Event'
                        WHEN 'purchase' THEN 'Purchase'
                        WHEN 'signup' THEN 'Signup'
                        WHEN 'error' THEN 'Error' END AS label
            FROM events
        """,
        "sdc_ported_dedup_fanin": """
            SELECT * FROM events
        """,
        "origin_http_paginated": """
            WITH first200 AS (
                SELECT event_id, event_type, value,
                       row_number() OVER (ORDER BY event_id) - 1 AS rn
                FROM events
                ORDER BY event_id
                LIMIT 200
            )
            SELECT CAST(rn // 50 AS INT) AS page,
                   CAST(rn % 50 AS INT) AS pos_in_page,
                   event_id, event_type, value
            FROM first200
        """,
        "origin_s3_spool": """
            WITH first120 AS (
                SELECT c_custkey, c_name, c_acctbal,
                       row_number() OVER (ORDER BY c_custkey) - 1 AS rn
                FROM customer
                ORDER BY c_custkey
                LIMIT 120
            )
            SELECT 'in/cust-' || lpad(CAST(rn // 20 AS VARCHAR), 2, '0')
                       || '.jsonl' AS key,
                   c_custkey, c_name, c_acctbal
            FROM first120
        """,
        "origin_sdcipc": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 150)
        """,
        "origin_http_push": """
            SELECT event_id, event_type, value
            FROM events ORDER BY event_id LIMIT 150
        """,
        "origin_websocket_push": """
            SELECT event_id, event_type, value
            FROM events ORDER BY event_id LIMIT 120
        """,
        "format_syslog_datagram": """
            SELECT event_id,
                   CAST((event_id % 191) // 8 AS INT) AS facility,
                   CAST((event_id % 191) % 8 AS INT) AS severity,
                   'host-' || CAST(event_id % 50 AS VARCHAR) AS host,
                   event_type AS app,
                   'ev ' || event_type AS message
            FROM events
        """,
        "format_avro_ocf": """
            SELECT event_id, ts, event_type, value FROM events
        """,
        "format_sdc_record": """
            SELECT event_id, date_trunc('milliseconds', ts) AS ts,
                   event_type, value
            FROM events
        """,
        "lookup_redis_kv": """
            SELECT c_custkey, c_nationkey, n_name AS nation_name
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        """,
        "origin_es_scroll": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_orderkey LIMIT 200
        """,
        "origin_rabbitmq": """
            SELECT event_id, event_type, value
            FROM events ORDER BY event_id LIMIT 150
        """,
        "origin_salesforce_bulk": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_orderkey LIMIT 180
        """,
        "sdc_ported_cdc_lake": f"""
            WITH {_LWW_CTE}
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM last_per_key WHERE op != 2
        """,
        "origin_mongodb": """
            SELECT lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS ck,
                   c_name, c_acctbal
            FROM customer ORDER BY c_custkey LIMIT 160
        """,
        "sink_mongodb_cdc": """
            WITH c AS (
                SELECT c_custkey, c_name, c_acctbal,
                       row_number() OVER (ORDER BY c_custkey) AS rn
                FROM customer ORDER BY c_custkey LIMIT 120
            )
            SELECT lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS ck,
                   c_name,
                   CASE WHEN rn <= 60 THEN c_acctbal * 2
                        ELSE c_acctbal END AS bal
            FROM c WHERE rn > 30
        """,
        "cdc_mongo_oplog_tail": """
            WITH c AS (
                SELECT c_custkey, c_name, c_acctbal,
                       row_number() OVER (ORDER BY c_custkey) AS rn
                FROM customer ORDER BY c_custkey LIMIT 100
            )
            SELECT lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS ck,
                   c_name,
                   CASE WHEN rn <= 50 THEN c_acctbal * 3
                        ELSE c_acctbal END AS bal
            FROM c WHERE rn > 20
        """,
        "proc_error_lane_headers": """
            SELECT event_id,
                   'Precondition_01' AS err_stage,
                   'CONTAINER_0051' AS err_code,
                   TRUE AS is_precondition
            FROM events
            WHERE NOT coalesce(value >= 10, FALSE)
        """,
        "el_dir_template": """
            SELECT '/out/' || strftime(ts, '%Y-%m-%d') || '/' || event_type AS dir,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "corpus_hash_split": _hash_split_oracle({"train": 0.8, "val": 0.1, "test": 0.1}),
        "dedup_simhash": _simhash_oracle(max_hamming=3, chunks=4),
        "ann_lsh_topk": _ann_lsh_oracle(dim=64, planes=6, k=5),
        "multimodal_image_features": _media_features_oracle(dim=16),
        "multimodal_frame_sampling": _FRAME_SAMPLING_ORACLE,
    }
