"""IVF ANN, benchmark decontamination, and stratified sampling — the
round-5 training-mix additions (operators/similarity.ivf_ann_topk,
operators/curation.decontaminate / stratified_sample)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------------------- IVF ANN
@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )


def test_ivf_full_probe_equals_brute_force(spark, emb):
    """nprobe == nlist degrades to exact search — the IVF plumbing
    (assign -> route -> score -> topk) proven against the exact oracle."""
    from datacollector_spark.operators.similarity import cosine_topk, ivf_ann_topk

    q = emb.where(F.col("vec_id") < 8)
    full = ivf_ann_topk(emb, q, dim=64, k=5, nlist=8, nprobe=8)
    bf = cosine_topk(emb, q, k=5)
    assert full.exceptAll(bf).count() == 0
    assert bf.exceptAll(full).count() == 0


def test_ivf_recall_at_nprobe_2(spark, emb):
    from datacollector_spark.operators.similarity import cosine_topk, ivf_ann_topk

    q = emb.where(F.col("vec_id") < 8)
    bf = cosine_topk(emb, q, k=5).select("query_id", "neighbor_id")
    appx = ivf_ann_topk(emb, q, dim=64, k=5, nlist=8, nprobe=2).select(
        "query_id", "neighbor_id"
    )
    hits = appx.intersect(bf).count()
    total = bf.count()
    # quarter of the lists probed; random-ish synthetic embeddings still
    # keep most true neighbors in the top-2 lists
    assert hits / total >= 0.75
    # and the candidate set really is pruned: fewer scored pairs than
    # brute force would produce for at least one query
    assert appx.count() <= total


def test_ivf_kmeans_refinement_runs_and_stays_valid(spark, emb):
    from datacollector_spark.operators.similarity import (
        ivf_ann_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(emb, 64, nlist=4, kmeans_iters=2)
    assert len(cents) == 4 and all(len(v) == 64 for _, v in cents)
    q = emb.where(F.col("vec_id") < 4)
    out = ivf_ann_topk(emb, q, dim=64, k=3, nlist=4, nprobe=2, centroids=cents)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 3


def test_ivf_assignment_deterministic_tiebreak(spark):
    """Two centroids at the SAME point: every vector must file under the
    lower cid (strictly-greater fold == SQL 'cos DESC, cid ASC')."""
    from datacollector_spark.operators.similarity import nearest_centroid

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8])], ["id", "v"]
    )
    cents = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [-1.0, -1.0])]
    got = df.select(
        nearest_centroid(F.col("v").cast("array<double>"), cents).alias("cid")
    ).collect()
    assert [r["cid"] for r in got] == [0, 0]


def test_truncate_embeddings_numpy_parity(spark, emb):
    import numpy as np

    from datacollector_spark.operators.similarity import truncate_embeddings

    rows = (
        truncate_embeddings(emb, dim_out=16)
        .where(F.col("vec_id") < 20)
        .select("vec_id", "embedding", "embedding_trunc")
        .collect()
    )
    assert len(rows) == 20
    for r in rows:
        v = np.array(r["embedding"][:16], dtype=np.float64)
        expect = v / np.linalg.norm(v)
        got = np.array(r["embedding_trunc"])
        assert got.shape == (16,)
        assert np.allclose(got, expect, atol=1e-12)
        assert abs(np.linalg.norm(got) - 1.0) < 1e-9
    # renormalize=False keeps raw prefix values
    raw = (
        truncate_embeddings(emb, dim_out=8, renormalize=False)
        .where(F.col("vec_id") == 0)
        .first()
    )
    assert raw["embedding_trunc"] == [float(x) for x in raw["embedding"][:8]]


def test_ivf_index_roundtrip_equals_inline(spark, emb, tmp_path):
    from datacollector_spark.operators.similarity import (
        build_ivf_index,
        ivf_ann_topk,
        ivf_index_search,
    )

    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(emb, idx, dim=64, nlist=8)
    assert len(cents) == 8
    q = emb.where(F.col("vec_id") < 8)
    got = ivf_index_search(spark, idx, q, k=5, nprobe=2)
    inline = ivf_ann_topk(emb, q, dim=64, k=5, nlist=8, nprobe=2)
    assert got.exceptAll(inline).count() == 0
    assert inline.exceptAll(got).count() == 0


def test_ivf_index_search_prunes_unprobed_partitions(spark, emb, tmp_path):
    """One query, nprobe=2: the scan's partition filter carries exactly the
    two probed cids — un-probed inverted lists never open."""
    import io
    from contextlib import redirect_stdout

    from datacollector_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_search,
    )

    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, dim=64, nlist=8)
    one = emb.where(F.col("vec_id") == 0)
    got = ivf_index_search(spark, idx, one, k=3, nprobe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    import re

    m = re.search(r"PartitionFilters: \[cid#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    assert len(m.group(1).split(",")) == 2
    assert got.count() == 3


# ------------------------------------------------------------ decontaminate
def test_decontaminate_planted_overlap(spark):
    from datacollector_spark.operators.curation import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # shares the 4-gram "quick brown fox jumps"
            (1, "a quick brown fox jumps high today"),
            # shares two distinct benchmark 4-grams
            (2, "the quick brown fox jumps over a fence"),
            # no 4-gram overlap (words overlap, grams don't)
            (3, "fox dog quick lazy brown the over jumps"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["contaminated"], r["n_matched"])
        for r in decontaminate(corpus, bench, n=4).collect()
    }
    assert out[1] == (True, 1)
    assert out[2][0] is True and out[2][1] >= 2
    assert out[3] == (False, 0)


def test_decontaminate_short_doc_whole_text_shingle(spark):
    """Docs shorter than n words fall back to the whole text as one
    shingle (word_shingles contract) — a verbatim short benchmark string
    in the corpus is still caught."""
    from datacollector_spark.operators.curation import decontaminate

    bench = spark.createDataFrame([(1, "two words")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(10, "two words"), (11, "other words")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, bench, n=13).collect()
    }
    assert out == {10: True, 11: False}


def test_decontaminate_shuffle_join_variant_matches(spark):
    from datacollector_spark.operators.curation import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 11 == 0)
    corp = docs.where(F.col("doc_id") % 11 != 0)
    a = decontaminate(corp, bench, n=3).select("doc_id", "n_matched")
    b = decontaminate(corp, bench, n=3, broadcast_benchmark=False).select(
        "doc_id", "n_matched"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_training_mix_parity_above_toy_scale(spark):
    """Correctness evidence ABOVE the 500-doc gate corpus: decontamination,
    sequence packing, and both IVF paths cross-checked against their DuckDB
    oracles at sf0.1 (5 000 documents / embeddings, 10x the gate scale)."""
    import duckdb

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    got = {
        (r["doc_id"], r["contaminated"], r["n_matched"])
        for r in qs["corpus_decontaminate"](spark, sf_dir).collect()
    }
    exp = set(map(tuple, con.execute(oracles["corpus_decontaminate"]).fetchall()))
    assert got == exp
    assert sum(1 for _, c, _ in got if c) > 20  # real signal at sf0.1

    got = {
        (r["doc_id"], r["pack_order"], r["pack_bin"], r["pack_offset"])
        for r in qs["corpus_pack_sequences"](spark, sf_dir).collect()
    }
    exp = set(map(tuple, con.execute(oracles["corpus_pack_sequences"]).fetchall()))
    assert got == exp and len(got) == 5000

    for q in ("ann_ivf_topk", "ann_ivf_index_search"):
        got = {
            (r["query_id"], r["neighbor_id"], round(r["cosine"], 6), r["rank"])
            for r in qs[q](spark, sf_dir).collect()
        }
        exp = {
            (a, b, round(c, 6), k)
            for a, b, c, k in con.execute(oracles[q]).fetchall()
        }
        assert got == exp, q


def test_curate_corpus_with_decontamination_stage(spark):
    """curate_corpus(benchmark=...) drops survivors sharing any n-gram with
    the eval set and reports the stage count."""
    from datacollector_spark.operators.curation import curate_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 11 == 0)
    corp = docs.where(F.col("doc_id") % 11 != 0)
    survivors, counts = curate_corpus(
        corp,
        min_quality=0.1,
        minhash_threshold=0.5,
        benchmark=bench,
        decontaminate_n=3,
    )
    assert "after_decontaminate" in counts
    assert counts["after_decontaminate"] <= counts["after_neardup"]
    assert survivors.count() == counts["after_decontaminate"]
    assert set(survivors.columns) == set(corp.columns)
    survivors.unpersist()


# ---------------------------------------------------------- chunk_documents
def test_chunk_documents_overlap_and_coverage(spark):
    import pytest as _pytest

    from datacollector_spark.operators.text import chunk_documents

    words = [f"w{i}" for i in range(25)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b"), (3, "")],
        "doc_id int, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, max_tokens=10, overlap=4).collect()
    }
    # doc 1: stride 6, 25 words -> ceil((25-4)/6)=4 chunks
    assert {i for d, i in rows if d == 1} == {0, 1, 2, 3}
    assert rows[(1, 0)][0].split() == words[0:10]
    assert rows[(1, 1)][0].split() == words[6:16]
    # consecutive chunks share exactly `overlap` words
    assert rows[(1, 0)][0].split()[-4:] == rows[(1, 1)][0].split()[:4]
    # last chunk runs short but reaches the final word
    assert rows[(1, 3)][0].split()[-1] == "w24"
    assert rows[(1, 3)][1] == len(rows[(1, 3)][0].split())
    # short/empty docs yield exactly one chunk
    assert rows[(2, 0)] == ("a b", 2)
    assert (3, 0) in rows and {i for d, i in rows if d == 3} == {0}
    with _pytest.raises(ValueError):
        chunk_documents(df, max_tokens=8, overlap=8)


def test_chunk_documents_every_word_covered(spark):
    from datacollector_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    chunks = chunk_documents(docs, max_tokens=24, overlap=8)
    # total distinct word POSITIONS covered == total words: reconstruct by
    # comparing per-doc token counts (stride tiling covers [0, n))
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("chunk_tokens").alias("covered"),
            F.count("*").alias("k"),
        )
        .join(
            docs.select(
                "doc_id",
                F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
            ),
            "doc_id",
        )
    )
    bad = agg.where(
        F.col("covered") != F.col("n") + (F.col("k") - 1) * 8
    ).count()
    assert bad == 0  # sum of chunk sizes = n + (k-1)*overlap exactly


# ----------------------------------------------------------- pack_sequences
def test_pack_sequences_distributed_equals_global_window(spark):
    """The two-level distributed prefix sum must reproduce the sequential
    definition (one global window) exactly, at several bucket widths."""
    from pyspark.sql import Window

    from datacollector_spark.functions.hashing import md5_long
    from datacollector_spark.operators.curation import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    h = md5_long(F.col("doc_id").cast("string"), salt="pack-v1")
    w = Window.orderBy(h, "doc_id")
    ref = (
        docs.withColumn(
            "pack_order", (F.row_number().over(w) - 1).cast("long")
        )
        .withColumn(
            "pack_offset",
            F.coalesce(
                F.sum(F.col("n_chars").cast("long")).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("pack_bin", F.expr("pack_offset DIV 512").cast("long"))
        .select("doc_id", "pack_order", "pack_bin", "pack_offset")
    )
    for bits in (2, 8):
        got = pack_sequences(
            docs, token_col="n_chars", budget=512, range_bits=bits
        ).select("doc_id", "pack_order", "pack_bin", "pack_offset")
        assert got.exceptAll(ref).count() == 0
        assert ref.exceptAll(got).count() == 0


def test_pack_sequences_bin_invariants(spark):
    """Docs are never split, bins are contiguous in the layout order, and
    each bin's content (minus its possible overflow doc) fits the budget."""
    from datacollector_spark.operators.curation import pack_sequences

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    budget = 1000
    got = pack_sequences(docs, token_col="n_chars", budget=budget).orderBy(
        "pack_order"
    )
    rows = got.select("pack_bin", "pack_offset", "n_chars").collect()
    # offsets strictly increase with order; bins are non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert b["pack_offset"] == a["pack_offset"] + a["n_chars"]
        assert b["pack_bin"] >= a["pack_bin"]
    # every doc STARTS inside its bin
    for r in rows:
        assert r["pack_offset"] // budget == r["pack_bin"]


# -------------------------------------------------------- stratified_sample
def test_stratified_fractions_growth_stable(spark):
    """Membership is a pure function of (id, salt): adding rows later never
    flips existing rows in or out (the hash_split stability contract)."""
    from datacollector_spark.operators.curation import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    small = docs.where(F.col("doc_id") < 30)
    frac = {"en": 0.5, "de": 1.0}
    s_small = stratified_sample(small, "lang", fractions=frac).select("doc_id")
    s_all = stratified_sample(docs, "lang", fractions=frac).select("doc_id")
    grown = s_all.where(F.col("doc_id") < 30)
    assert s_small.exceptAll(grown).count() == 0
    assert grown.exceptAll(s_small).count() == 0


def test_stratified_fractions_bounds_and_default(spark):
    from datacollector_spark.operators.curation import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = stratified_sample(docs, "lang", fractions={"en": 1.0})
    assert full.where("lang = 'en'").count() == docs.where("lang = 'en'").count()
    # default_fraction=0.0 drops every unlisted stratum
    assert full.where("lang != 'en'").count() == 0
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", fractions={"en": 1.5})
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang")
    with pytest.raises(ValueError):
        stratified_sample(
            docs, "lang", fractions={"en": 0.5}, exact_n={"en": 3}
        )


def test_spark_submit_training_mix_job(spark, tmp_path):
    """Launch contract for the end-to-end training-mix build: package the
    engine, run jobs/build_training_mix.py through spark-submit --py-files
    (curate -> decontaminate -> mix -> split -> pack -> partitioned
    parquet), assert the stage counts, the written layout, and that the
    packed columns agree with the operators run in-process."""
    import json as _json
    import os
    import shutil
    import subprocess
    import sys

    import pytest as _pytest

    from tools.package import build

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not (spark_submit and os.path.exists(spark_submit)) and os.path.exists(cand):
        spark_submit = cand
    if not (spark_submit and os.path.exists(spark_submit)):
        _pytest.skip("spark-submit not found")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench_path = str(tmp_path / "bench")
    docs.where(F.col("doc_id") % 37 == 0).write.parquet(bench_path)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = build(str(tmp_path / "dist" / "datacollector_spark.zip"))
    out_dir = str(tmp_path / "mix")
    proc = subprocess.run(
        [
            spark_submit, "--master", "local[4]", "--py-files", zip_path,
            os.path.join(repo, "jobs", "build_training_mix.py"),
            "--input", f"{SF}/documents.parquet",
            "--output", out_dir,
            "--benchmark", bench_path,
            "--decontaminate-n", "4",
            "--mix", "lang:en=1.0,lang:de=1.0,lang:fr=0.5",
            "--mix-default", "0.2",
            "--splits", "train=0.9,val=0.05,test=0.05",
            "--budget", "2000",
            "--min-quality", "0.1",
            "--chunk-max-tokens", "24",
            "--chunk-overlap", "8",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("MIX_RESULT ")]
    assert line, proc.stdout[-2000:]
    res = _json.loads(line[0][len("MIX_RESULT "):])
    st = res["stages"]
    assert st["input"] == 500
    assert st["after_decontaminate"] <= st["after_neardup"] <= st["after_exact"]
    assert res["splits"]["train"]["rows"] > 0
    assert st["mix_rows"] == sum(s["rows"] for s in res["splits"].values())

    out = spark.read.parquet(out_dir)
    assert set(out.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }
    assert out.count() == st["mix_rows"]
    # chunked path: rows are (doc, chunk) windows, every chunk fits the
    # window, and a document's chunks never straddle splits
    assert {"chunk_id", "chunk_idx", "chunk_tokens"} <= set(out.columns)
    assert out.where("chunk_tokens > 24").count() == 0
    assert out.count() >= st["mix_rows"]
    leaks = (
        out.select("doc_id", "split")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .where("n > 1")
        .count()
    )
    assert leaks == 0
    # packing inside the job == the operator run in-process on the same split
    from datacollector_spark.operators.curation import pack_sequences

    train_ids = out.where("split = 'train'").select(
        "chunk_id", "pack_order", "pack_bin", "pack_offset"
    )
    redo = pack_sequences(
        out.where("split = 'train'").select("chunk_id", "chunk_tokens"),
        id_col="chunk_id",
        token_col="chunk_tokens",
        budget=2000,
        salt="pack-train",
    ).select("chunk_id", "pack_order", "pack_bin", "pack_offset")
    assert train_ids.exceptAll(redo).count() == 0
    assert redo.exceptAll(train_ids).count() == 0


def test_stratified_exact_n_quotas(spark):
    from datacollector_spark.operators.curation import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    per_stratum = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    take = stratified_sample(
        docs, "source", exact_n={"src0": 3, "src1": 10_000}
    )
    counts = {
        r["source"]: r["n"]
        for r in take.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("src0", 0) == min(3, per_stratum["src0"])
    # quota above stratum size returns the whole stratum
    assert counts.get("src1", 0) == per_stratum["src1"]
    # unlisted strata dropped
    assert set(counts) <= {"src0", "src1"}
    # deterministic across runs
    again = stratified_sample(docs, "source", exact_n={"src0": 3, "src1": 10_000})
    assert take.exceptAll(again).count() == 0
