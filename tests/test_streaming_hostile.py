"""Hostile-corpus sweep over the STREAMING twins (VERDICT r9 item 4).

The r9 degenerate/NULL sweeps covered the batch registry; the nine
streaming jobs share most — but not all — code paths with their batch
twins: the applyInPandasWithState update closures (pandas-side NULL
handling: NaN/None arrive where the batch Column expressions see SQL
NULL), the foreachBatch/mapInPandas folds, and the session-window merge
are streaming-only. This module replays the batch sweeps' hostile
shapes through every streaming job and pins parity against the same
batch twins the healthy-corpus tests use:

- events with NULL value and NULL props, including one user whose
  values are ALL NULL (the pandas ``max`` poisoning shape) and funnel /
  interval-join sequences carrying NULL values;
- documents with NULL text / lang / source / n_chars (the
  ``int(NaN)`` worker-crash shape for stateful update closures), empty
  and whitespace-only texts, sub-window token counts, and duplicate
  content split across the corpus and the increment residue class;
- embeddings with zero-norm vectors on BOTH the benchmark and the
  training side plus exactly-identical vectors (cosine 1.0 at the
  round(.,4) boundary).

A crash anywhere here is a real incident: at 100 TB some micro-batch IS
all-NULL, and a streaming job dies with its state store, not just a
task retry.
"""

from __future__ import annotations

import shutil
from datetime import datetime, timedelta
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dic_a1_spark.config import TABLES
from dic_a1_spark.operators import events as batch_events
from dic_a1_spark.streaming import jobs
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("stream_hostile_sf")
    for t in TABLES:
        if t in ("documents", "events", "embeddings"):
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", Path(out) / f"{t}.parquet")

    # --- documents: NULLs everywhere the schema allows + increment
    # residue-class (doc_id % 8 == 3) coverage with hostile members.
    docs = [
        # (doc_id, text, lang, source)
        (0, "normal doc alpha beta", "en", "s0"),
        (1, None, None, "s0"),                     # corpus NULL text
        (2, "shared vocab alpha", "de", None),
        (3, None, "en", None),                      # INCREMENT, NULL text + NULL n_chars
        (4, "   \t ", "en", "s1"),                  # whitespace only
        (5, "solo alpha beta alpha", None, "s1"),
        (6, "x x x", "zh", "s2"),
        (7, "one two", "en", "s2"),                 # sub-window (< CDC_K)
        (11, "alpha vocab shared", "en", "s3"),     # INCREMENT, tokenset-dup of doc 2
        (19, "fresh unique increment doc", "de", "s3"),  # INCREMENT, admitted
        (27, "", "en", "s4"),                       # INCREMENT, empty text
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array([d[2] for d in docs], pa.string()),
            "source": pa.array([d[3] for d in docs], pa.string()),
            "n_chars": pa.array(
                [len(d[1]) if d[1] is not None else None for d in docs],
                pa.int64(),
            ),
        }
    )
    pq.write_table(tbl, Path(out) / "documents.parquet")

    # --- events: NULL value / NULL props; user 2 is ALL-NULL values.
    t0 = datetime(2024, 6, 1, 12, 0, 0)
    ev = [
        # (ts, user_id, event_type, value, props)
        (t0, 1, "view", 1.0, '{"k": 1}'),
        (t0 + timedelta(minutes=4), 1, "click", None, None),
        (t0 + timedelta(minutes=20), 1, "purchase", 9.5, '{"k": 2}'),
        (t0, 2, "view", None, None),
        (t0 + timedelta(minutes=7), 2, "click", None, '{"k": 3}'),
        (t0 + timedelta(minutes=11), 2, "purchase", None, None),
        (t0 + timedelta(hours=1), 3, "click", 2.5, None),
        (t0 + timedelta(hours=1, minutes=25), 3, "purchase", None, '{"k": 4}'),
        (t0 + timedelta(hours=2), 3, "error", 0.0, '{"k": 5}'),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ev)), pa.int64()),
            "ts": pa.array([r[0] for r in ev], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in ev], pa.int64()),
            "event_type": pa.array([r[2] for r in ev], pa.string()),
            "value": pa.array([r[3] for r in ev], pa.float64()),
            "props": pa.array([r[4] for r in ev], pa.string()),
        }
    )
    pq.write_table(tbl, Path(out) / "events.parquet")

    # --- embeddings: bench slice is vec_id % 97 == 0 -> {0, 97}.
    # vec 0 (bench) is ZERO-NORM; vec 97 (bench) is the constant vector;
    # stream side mixes zero-norm, the identical constant (cos == 1.0),
    # and a scaled copy (cos == 1.0 again) with ordinary vectors.
    dim = 16
    const = [1.0 if d % 2 else -1.0 for d in range(dim)]
    vecs, ids = [], []
    for i in range(120):
        ids.append(i)
        if i == 0:
            vecs.append([0.0] * dim)            # zero-norm BENCH vector
        elif i == 97:
            vecs.append(const)                  # constant BENCH vector
        elif i % 5 == 0:
            vecs.append([0.0] * dim)            # zero-norm stream vectors
        elif i % 5 == 1:
            vecs.append(const)                  # cos exactly 1.0
        elif i % 5 == 2:
            vecs.append([2.0 * x for x in const])  # scaled: cos 1.0
        else:
            vecs.append(
                [float((i * 7 + d * 3) % 11 - 5) for d in range(dim)]
            )
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in ids], pa.int32()),
        }
    )
    pq.write_table(tbl, Path(out) / "embeddings.parquet")
    return str(out)


# --- windowed / dedup aggregations ------------------------------------------


def test_hostile_tumbling_matches_batch(spark, hostile_dir):
    stream = jobs.read_events_stream(spark, hostile_dir)
    jobs.run_to_memory(jobs.tumbling_counts(stream), "h_tumbling")
    got = spark.table("h_tumbling")
    want = batch_events.events_tumbling_hour(spark, hostile_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_hostile_sessions_match_batch(spark, hostile_dir):
    stream = jobs.read_events_stream(spark, hostile_dir)
    jobs.run_to_memory(jobs.session_counts(stream), "h_sessions")
    got = spark.table("h_sessions")
    want = batch_events.events_session_windows(spark, hostile_dir).select(
        "user_id", "session_start", "n_events"
    )
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_hostile_dedup_within_watermark(spark, hostile_dir):
    stream = jobs.read_events_stream(spark, hostile_dir)
    jobs.run_to_memory(
        jobs.dedup_within_watermark(stream), "h_dedup", output_mode="append"
    )
    got = spark.table("h_dedup")
    want_keys = batch_events.events_first_per_user_type(
        spark, hostile_dir
    ).select("user_id", "event_type")
    assert _rows(got.select("user_id", "event_type"), ["user_id", "event_type"]) == _rows(
        want_keys, ["user_id", "event_type"]
    )


# --- stateful pandas closures -------------------------------------------------


def test_hostile_running_stats_all_null_user(spark, hostile_dir):
    """User 2's values are ALL NULL: the batch max(value) is NULL, and
    the stateful pandas max must agree — not emit -inf (the seed) or NaN
    (pandas all-NaN max)."""
    from pyspark.sql import functions as F

    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_events_stream(spark, hostile_dir)
    jobs.run_to_memory(
        jobs.running_user_stats(stream), "h_state", output_mode="update"
    )
    got = spark.table("h_state")
    last = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("max_value").alias("max_value"),
    )
    want = (
        load_table(spark, hostile_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
    )
    cols = ["user_id", "n_events", "max_value"]
    assert _rows(last, cols) == _rows(want, cols)


def test_hostile_funnel_matches_batch(spark, hostile_dir):
    from pyspark.sql import functions as F

    from dic_a1_spark.operators.events import events_funnel_depth

    stream = jobs.read_events_stream(spark, hostile_dir)
    jobs.run_to_memory(
        jobs.funnel_depths(stream), "h_funnel", output_mode="update"
    )
    got = spark.table("h_funnel")
    last = (
        got.groupBy("user_id")
        .agg(
            F.max(
                F.struct("funnel_depth", "view_ts", "click_ts", "purchase_ts")
            ).alias("s")
        )
        .select(
            "user_id",
            F.col("s.view_ts").alias("view_ts"),
            F.col("s.click_ts").alias("click_ts"),
            F.col("s.purchase_ts").alias("purchase_ts"),
            F.col("s.funnel_depth").cast("long").alias("funnel_depth"),
        )
    )
    want = events_funnel_depth(spark, hostile_dir).withColumn(
        "funnel_depth", F.col("funnel_depth").cast("long")
    )
    cols = ["user_id", "view_ts", "click_ts", "purchase_ts", "funnel_depth"]
    assert _rows(last, cols) == _rows(want, cols)


def test_hostile_interval_join_matches_static(spark, hostile_dir):
    from pyspark.sql import functions as F

    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_events_stream(spark, hostile_dir)
    jobs.run_to_memory(
        jobs.clicks_before_purchases(stream), "h_ssjoin", output_mode="append"
    )
    got = spark.table("h_ssjoin").select("purchase_id", "click_id")
    e = load_table(spark, hostile_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    want = purchases.join(
        clicks,
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
        ),
    ).select("purchase_id", "click_id")
    cols = ["purchase_id", "click_id"]
    assert _rows(got, cols) == _rows(want, cols) and got.count() > 0


def test_hostile_incremental_admission_matches_batch(spark, hostile_dir):
    """NULL text hashes to a NULL content key and NULL n_chars arrives
    as NaN in the pandas state closure — the exact `len(None)` crash
    class the r9 multimodal sweep hit, now on the streaming surface."""
    from pyspark.sql import functions as F

    from dic_a1_spark.operators.incremental import dedup_incremental_keep

    stream = jobs.read_increment_stream(spark, hostile_dir)
    jobs.run_to_memory(
        jobs.incremental_admission(stream, spark, hostile_dir),
        "h_inc_admit",
        output_mode="update",
    )
    last = (
        spark.table("h_inc_admit")
        .groupBy("content_hash")
        .agg(F.min(F.struct("doc_id", "lang", "source", "n_chars")).alias("s"))
        .select("content_hash", "s.doc_id", "s.lang", "s.source", "s.n_chars")
    )
    got = {
        (r["doc_id"], r["content_hash"], r["lang"], r["source"], r["n_chars"])
        for r in last.collect()
    }
    want = {
        (r["doc_id"], r["content_hash"], r["lang"], r["source"], r["n_chars"])
        for r in dedup_incremental_keep(spark, hostile_dir).collect()
    }
    assert got == want
    assert got, "no admissions — increment residue class empty?"


# --- stateless scoring twins ---------------------------------------------------


def test_hostile_dsir_scores_match_batch(spark, hostile_dir):
    from dic_a1_spark.operators.dsir import dsir_logratio_weights

    stream = jobs.read_documents_stream(spark, hostile_dir)
    jobs.run_to_memory(
        jobs.dsir_stream_scores(stream, spark, hostile_dir),
        "h_dsirscores",
        output_mode="append",
    )
    got = _rows(
        spark.table("h_dsirscores"),
        ["doc_id", "n_feats", "score_fp", "avg_fp"],
    )
    want = _rows(
        dsir_logratio_weights(spark, hostile_dir).select(
            "doc_id", "n_feats", "score_fp", "avg_fp"
        ),
        ["doc_id", "n_feats", "score_fp", "avg_fp"],
    )
    assert got == want and got


def test_hostile_bm25_scores_match_batch(spark, hostile_dir):
    from dic_a1_spark.operators.bm25 import BM25_QUERY, _scored
    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_documents_stream(spark, hostile_dir)
    jobs.run_to_memory(
        jobs.bm25_stream_scores(stream, spark, hostile_dir),
        "h_bm25scores",
        output_mode="append",
    )
    cols = ["doc_id", "dl", "n_hit_terms", "score"]
    got = _rows(spark.table("h_bm25scores"), cols)
    want = _rows(
        _scored(load_table(spark, hostile_dir, "documents"), BM25_QUERY), cols
    )
    assert got == want  # may be empty: BM25_QUERY terms need not occur


def test_hostile_line_census_matches_batch(spark, hostile_dir):
    from dic_a1_spark.operators import linededup

    stream = jobs.read_documents_stream(spark, hostile_dir)
    jobs.run_to_memory(jobs.line_instance_census(stream), "h_linecensus")
    got = _rows(spark.table("h_linecensus"), ["line_text", "n_inst"])
    want = _rows(
        linededup._census(linededup._lines(spark, hostile_dir)).select(
            "line_text", "n_inst"
        ),
        ["line_text", "n_inst"],
    )
    assert got == want


def test_hostile_cdc_census_matches_batch(spark, hostile_dir):
    from pyspark.sql import functions as F

    from dic_a1_spark.operators import cdc
    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_documents_stream(spark, hostile_dir)
    jobs.run_to_memory(jobs.cdc_chunk_census(stream), "h_cdccensus")
    got = _rows(spark.table("h_cdccensus"), ["chunk_hash", "n_tokens", "n_inst"])
    want = _rows(
        cdc._chunks(load_table(spark, hostile_dir, "documents"))
        .groupBy("chunk_hash")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count("*").alias("n_inst"),
        ),
        ["chunk_hash", "n_tokens", "n_inst"],
    )
    assert got == want and got


@pytest.fixture(scope="module")
def barren_dir(tmp_path_factory):
    """Second hostile shape: the collected-statistics twins' sources are
    BARREN — every document is NULL/whitespace (token-free: the dsir
    census and bm25 idf tables collect EMPTY) and no embedding vec_id
    hits the benchmark residue class (the bench collect is EMPTY). Every
    'fit stats batch-side, embed as literals' stream job must survive
    plan construction and produce the correct degenerate output, not die
    on a VOID map() literal or an np.stack([]) on the driver."""
    out = tmp_path_factory.mktemp("stream_barren_sf")
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", Path(out) / f"{t}.parquet")
    texts = [None, "   ", None, "\t", None]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array(
                [len(t) if t is not None else None for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(tbl, Path(out) / "documents.parquet")
    dim = 8
    ids = list(range(1, 61))  # no id % 97 == 0 -> EMPTY bench slice
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [[float(i + d) for d in range(dim)] for i in ids],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([i % 3 for i in ids], pa.int32()),
        }
    )
    pq.write_table(tbl, Path(out) / "embeddings.parquet")
    return str(out)


def test_barren_dsir_stream_survives_empty_census(spark, barren_dir):
    """Token-free corpus -> EMPTY collected bucket census: the weight
    map literal must stay typed (not VOID) and the stream must simply
    emit nothing (no doc has a scorable token)."""
    stream = jobs.read_documents_stream(spark, barren_dir)
    jobs.run_to_memory(
        jobs.dsir_stream_scores(stream, spark, barren_dir),
        "b_dsirscores",
        output_mode="append",
    )
    assert spark.table("b_dsirscores").count() == 0


def test_barren_bm25_stream_survives_empty_idf(spark, barren_dir):
    stream = jobs.read_documents_stream(spark, barren_dir)
    jobs.run_to_memory(
        jobs.bm25_stream_scores(stream, spark, barren_dir),
        "b_bm25scores",
        output_mode="append",
    )
    assert spark.table("b_bm25scores").count() == 0


def test_barren_embdecontam_survives_empty_bench(spark, barren_dir):
    """Empty benchmark slice: every incoming vector passes unflagged —
    the driver must not np.stack an empty list at build time."""
    stream = jobs.read_embeddings_stream(spark, barren_dir)
    jobs.run_to_memory(
        jobs.embdecontam_stream_flags(stream, spark, barren_dir),
        "b_embdec",
        output_mode="append",
    )
    rows = spark.table("b_embdec").collect()
    assert len(rows) == 60
    assert all(
        (not r["flagged"])
        and r["n_hits"] == 0
        and r["best_bench_id"] is None
        and r["best_sim_r"] is None
        for r in rows
    )


@pytest.fixture(scope="module")
def empty_stream_dir(tmp_path_factory):
    """Fully EMPTY sources (0-row valid parquet for documents, events,
    embeddings): every streaming job must run an availableNow replay to
    completion and emit nothing — not die in a collect, a state update,
    or plan analysis."""
    out = tmp_path_factory.mktemp("stream_empty_sf")
    for t in TABLES:
        if t in ("documents", "events", "embeddings"):
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", Path(out) / f"{t}.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        Path(out) / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        Path(out) / "events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
                "label": pa.array([], pa.int32()),
            }
        ),
        Path(out) / "embeddings.parquet",
    )
    return str(out)


def test_all_streaming_jobs_survive_empty_sources(spark, empty_stream_dir):
    d = empty_stream_dir
    plans = [
        ("tumbling", jobs.tumbling_counts(jobs.read_events_stream(spark, d)), "complete"),
        ("sessions", jobs.session_counts(jobs.read_events_stream(spark, d)), "complete"),
        ("dedup", jobs.dedup_within_watermark(jobs.read_events_stream(spark, d)), "append"),
        ("runstats", jobs.running_user_stats(jobs.read_events_stream(spark, d)), "update"),
        ("ssjoin", jobs.clicks_before_purchases(jobs.read_events_stream(spark, d)), "append"),
        ("funnel", jobs.funnel_depths(jobs.read_events_stream(spark, d)), "update"),
        ("linecensus", jobs.line_instance_census(jobs.read_documents_stream(spark, d)), "complete"),
        ("cdccensus", jobs.cdc_chunk_census(jobs.read_documents_stream(spark, d)), "complete"),
        ("dsir", jobs.dsir_stream_scores(jobs.read_documents_stream(spark, d), spark, d), "append"),
        ("bm25", jobs.bm25_stream_scores(jobs.read_documents_stream(spark, d), spark, d), "append"),
        ("incadmit", jobs.incremental_admission(jobs.read_increment_stream(spark, d), spark, d), "update"),
        ("embdec", jobs.embdecontam_stream_flags(jobs.read_embeddings_stream(spark, d), spark, d), "append"),
    ]
    for name, df, mode in plans:
        jobs.run_to_memory(df, f"es_{name}", output_mode=mode)
        assert spark.table(f"es_{name}").count() == 0, name


def test_hostile_embdecontam_zero_norms(spark, hostile_dir):
    """Zero-norm vectors on BOTH sides of the bipartite screen: NaN
    similarities must never flag, the zero-norm bench column must be
    inert, and the exact-1.0 cosines (identical and scaled copies of the
    constant bench vector) must flag with best_sim_r == 1.0."""
    import numpy as np

    from dic_a1_spark.operators.embdecontam import (
        EMBDECONTAM_MOD,
        EMBDECONTAM_SIM,
    )
    from dic_a1_spark.operators.similarity import _round4_ge_boundary
    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_embeddings_stream(spark, hostile_dir)
    jobs.run_to_memory(
        jobs.embdecontam_stream_flags(stream, spark, hostile_dir),
        "h_embdec",
        output_mode="append",
    )
    got = {r["vec_id"]: r for r in spark.table("h_embdec").collect()}

    rows = (
        load_table(spark, hostile_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    is_b = (ids % EMBDECONTAM_MOD) == 0
    bids, B = ids[is_b], V[is_b]
    tids, T = ids[~is_b], V[~is_b]
    bo, to = np.argsort(bids), np.argsort(tids)
    bids, B, tids, T = bids[bo], B[bo], tids[to], T[to]
    floor = _round4_ge_boundary(EMBDECONTAM_SIM)
    bacc = np.zeros(len(B))
    tacc = np.zeros(len(T))
    acc = np.zeros((len(T), len(B)))
    for d in range(V.shape[1]):
        bacc += B[:, d] * B[:, d]
        tacc += T[:, d] * T[:, d]
        acc += T[:, d][:, None] * B[:, d][None, :]
    with np.errstate(invalid="ignore", divide="ignore"):
        S = acc / (np.sqrt(tacc)[:, None] * np.sqrt(bacc)[None, :])

    assert set(got) == set(tids.tolist())
    n_flagged = 0
    for i, vid in enumerate(tids.tolist()):
        with np.errstate(invalid="ignore"):
            hits = S[i] >= floor
        r = got[vid]
        assert r["flagged"] == bool(hits.any()), vid
        assert r["n_hits"] == int(hits.sum()), vid
        if vid % 5 == 0:  # zero-norm training vectors: never flagged
            assert not r["flagged"] and r["best_bench_id"] is None, vid
        if vid % 5 in (1, 2) and vid % EMBDECONTAM_MOD != 0:
            assert r["flagged"] and r["best_sim_r"] == 1.0, vid
        if hits.any():
            n_flagged += 1
            masked = np.where(hits, S[i], -np.inf)
            j = int(np.argmax(masked))
            assert r["best_bench_id"] == int(bids[j]), vid
    assert n_flagged > 0


# ---------------------------------------------------------------------------
# Watermark-drop parity (r11, VERDICT r10 item 7). The suites above replay
# everything in ONE micro-batch, so the watermark never advances mid-run and
# the late-record filter is never exercised. Here the events arrive as THREE
# files processed as separate micro-batches (maxFilesPerTrigger=1, ordered
# by mtime): file 1 drives the watermark to max(ts) - 2h, file 2 is an
# on-time continuation (needed because Spark's late-record filter uses the
# PREVIOUS batch's eviction watermark — `watermarkForLateEvents` lags one
# batch, verified empirically on a two-file layout where nothing dropped),
# and file 3 carries events BELOW that lagged watermark — every watermarked
# job must drop them, i.e. equal its own batch twin computed over the
# events with the late rows filtered out. A flusher event far in the future
# closes all real windows so append-mode emission is total except the
# flusher's own window.
# ---------------------------------------------------------------------------

_WM_T0 = datetime(2024, 9, 1, 0, 0, 0)


def _wm_events():
    """(file1, file2, file3, late_ids): rows are (id, ts, user, type, val)."""
    t = lambda m: _WM_T0 + timedelta(minutes=m)  # noqa: E731
    file1 = [
        (1, t(0), 1, "view", 1.0),
        (2, t(8), 1, "click", 2.0),
        (3, t(16), 1, "purchase", 3.0),
        (4, t(300), 2, "click", 4.0),  # max ts 5h -> watermark = T0+3h
        # high-ts purchase: the stream-stream join's global watermark is
        # the MIN across both sides' watermarks, so the purchase branch
        # must also reach T0+5h in batch 1 or the late filter stays at
        # the epoch and drops nothing (observed empirically)
        (10, t(300), 8, "purchase", 10.0),
    ]
    file2 = [
        (7, t(330), 2, "purchase", 7.0),   # on time; matches id 4
        (8, t(360), 1, "click", 8.0),      # on time, new window
    ]
    file3 = [
        (5, t(60), 3, "click", 5.0),       # LATE (1h < lagged wm >= 3h)
        (6, t(80), 3, "purchase", 6.0),    # LATE (would match id 5)
        (9, t(6000), 9, "view", 9.0),      # flusher: watermark -> T0+98h
    ]
    return file1, file2, file3, {5, 6}


def _write_events_file(path: Path, rows) -> None:
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        path,
    )


@pytest.fixture(scope="module")
def wm_stream_dir(tmp_path_factory):
    import os

    out = tmp_path_factory.mktemp("wm_drop_sf")
    *files, _late = _wm_events()
    # The file source orders by modification time; pin mtimes explicitly
    # so file 1 ALWAYS forms micro-batch 1 (it must set the watermark
    # that — one batch later — drops file 3's late rows).
    now = 1_700_000_000
    for i, rows in enumerate(files):
        p = Path(out) / f"events_{i}.parquet"
        _write_events_file(p, rows)
        os.utime(p, (now + 100 * i, now + 100 * i))
    return str(out)


def _wm_stream(spark, wm_dir):
    from pyspark.sql.types import TimestampType

    return (
        spark.readStream.schema(jobs._events_schema(TimestampType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(wm_dir)
    )


def _batch_df(spark, rows):
    from pyspark.sql.types import TimestampType

    return spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], "{}") for r in rows],
        jobs._events_schema(TimestampType()),
    )


def _kept(include_flusher: bool):
    *files, late = _wm_events()
    rows = [r for f in files for r in f if r[0] not in late]
    if not include_flusher:
        rows = [r for r in rows if r[2] != 9]
    return rows


def test_watermark_drops_late_tumbling(spark, wm_stream_dir):
    jobs.run_to_memory(
        jobs.tumbling_counts(_wm_stream(spark, wm_stream_dir)),
        "wm_tumbling",
        output_mode="append",
    )
    got = spark.table("wm_tumbling")
    # batch twin: same grouping over the kept events; the flusher's own
    # window is not closed by the final watermark, so it is excluded.
    want = jobs.tumbling_counts(_batch_df(spark, _kept(include_flusher=False)))
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)
    # the late window must truly be absent, not merely different
    assert all(r["window_start"] != "2024-09-01 01:00:00" for r in got.collect())


def test_watermark_drops_late_sessions(spark, wm_stream_dir):
    jobs.run_to_memory(
        jobs.session_counts(_wm_stream(spark, wm_stream_dir)),
        "wm_sessions",
        output_mode="append",
    )
    got = spark.table("wm_sessions")
    want = jobs.session_counts(_batch_df(spark, _kept(include_flusher=False)))
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)
    assert all(r["user_id"] != 3 for r in got.collect())


def test_watermark_drops_late_dedup(spark, wm_stream_dir):
    jobs.run_to_memory(
        jobs.dedup_within_watermark(_wm_stream(spark, wm_stream_dir)),
        "wm_dedup",
        output_mode="append",
    )
    got = spark.table("wm_dedup")
    # dedup emits survivors immediately (no window finalization), so the
    # flusher IS in the expected set; user 3's late events are not.
    want_keys = sorted(
        {(r[2], r[3]) for r in _kept(include_flusher=True)}
    )
    assert _rows(got.select("user_id", "event_type"), ["user_id", "event_type"]) == want_keys


def test_watermark_drops_late_join_sides(spark, wm_stream_dir):
    jobs.run_to_memory(
        jobs.clicks_before_purchases(_wm_stream(spark, wm_stream_dir)),
        "wm_ssjoin",
        output_mode="append",
    )
    got = _rows(
        spark.table("wm_ssjoin").select("purchase_id", "click_id"),
        ["purchase_id", "click_id"],
    )
    # kept matches only: purchase 3 <- click 2, purchase 7 <- click 4;
    # the late u3 pair (6 <- 5) must be dropped on BOTH sides.
    assert got == [(3, 2), (7, 4)]


# --- time extremes: negative epochs through the watermarked twins ----------
#
# The r11 TIME-EXTREMES batch corpus (tests/test_degenerate_corpus.py)
# replayed through the streaming twins. The load-bearing question is the
# watermark's INITIAL value: Spark seeds the event-time watermark at
# epoch 0 ms, but the LATE-ROW filter of micro-batch N uses the eviction
# watermark of batch N-1 (the lag pinned by the watermark-drop suite
# below), so a single-batch availableNow replay admits every pre-1970
# row — batch/stream parity holds even for 1582. These tests pin that:
# a regression that filters against the CURRENT batch's watermark would
# silently drop every pre-1970 event here and fork from the batch twin.


@pytest.fixture(scope="module")
def time_extremes_stream_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("stream_time_extremes_sf")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", Path(out) / f"{t}.parquet")
    rows = [
        (datetime(1969, 7, 20, 20, 17, 0), 1, "click", 1.25),
        (datetime(1969, 7, 20, 20, 59, 59, 999999), 1, "purchase", 2.5),
        (datetime(1969, 12, 31, 23, 30, 0), 2, "click", 0.75),
        (datetime(1969, 12, 31, 23, 59, 59, 999999), 2, "error", 1.0),
        (datetime(1970, 1, 1, 0, 0, 0), 2, "purchase", 3.25),
        (datetime(1970, 1, 1, 0, 59, 59), 3, "click", 0.5),
        (datetime(1970, 1, 1, 1, 0, 0), 3, "click", 0.5),
        (datetime(1582, 10, 15, 12, 0, 0), 4, "click", 4.0),
        (datetime(2024, 3, 1, 9, 0, 0, 123456), 5, "click", 1.0),
        (datetime(2024, 3, 1, 9, 0, 0, 123456), 5, "purchase", 2.0),
        (datetime(2024, 3, 1, 9, 0, 0, 123456), 6, "click", 3.0),
        (datetime(2038, 1, 19, 3, 14, 7), 6, "purchase", 5.0),
        (datetime(2038, 1, 19, 3, 14, 8), 6, "error", 5.5),
        (datetime(2200, 6, 15, 18, 30, 0), 7, "click", 6.0),
        (datetime(2024, 5, 1, 10, 0, 0), 8, "click", 1.5),
        (datetime(2024, 5, 1, 10, 10, 0), 8, "click", 1.5),
        (datetime(2024, 5, 1, 10, 20, 0), 8, "purchase", 7.5),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, Path(out) / "events.parquet")
    return str(out)


def test_time_extremes_tumbling_matches_batch(spark, time_extremes_stream_dir):
    stream = jobs.read_events_stream(spark, time_extremes_stream_dir)
    jobs.run_to_memory(jobs.tumbling_counts(stream), "te_tumbling")
    got = spark.table("te_tumbling")
    want = batch_events.events_tumbling_hour(spark, time_extremes_stream_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_time_extremes_sessions_drop_pre_epoch_closers(
    spark, time_extremes_stream_dir
):
    """Pinned Spark ASYMMETRY (do not 'fix' the twin to mask it): the
    session-window operator applies its late filter against the initial
    epoch-0 watermark in the very first micro-batch, so any session that
    CLOSES before 1970-01-01 is silently dropped — while the tumbling
    window aggregation (test above) admits the same rows. A session
    STRADDLING the epoch survives (this corpus: user 2's 23:59:59.999999
    event merges with the epoch-0 purchase via a 1-microsecond gap).
    Operationally at 100 TB: pre-1970 garbage timestamps must be
    filtered or clamped at ingestion BEFORE a streaming sessionization,
    or the stream silently diverges from its batch twin."""
    from pyspark.sql import functions as F

    stream = jobs.read_events_stream(spark, time_extremes_stream_dir)
    jobs.run_to_memory(jobs.session_counts(stream), "te_sessions")
    got = spark.table("te_sessions")
    want = batch_events.events_session_windows(
        spark, time_extremes_stream_dir
    ).where(F.col("session_end") >= "1970-01-01 00:00:00")
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)
    # the filter is load-bearing: batch has 4 pre-epoch-closing sessions
    full = batch_events.events_session_windows(spark, time_extremes_stream_dir)
    assert full.count() - want.count() == 4


def test_time_extremes_dedup_drops_at_or_before_epoch(
    spark, time_extremes_stream_dir
):
    """Pinned Spark ASYMMETRY #2: dropDuplicatesWithinWatermark applies a
    ROW-level late filter against the initial epoch-0 watermark in the
    first micro-batch — every row with ts <= 1970-01-01 00:00:00 is
    silently dropped (including the row AT exactly the epoch), while the
    complete-mode tumbling aggregation admits the same rows (parity test
    above). Survivors here: the post-epoch uniques — events 5 (00:59:59),
    8-13, 14, 16; event 6 is a true (user,type) duplicate of 5 and
    events 15 is a duplicate of 14. Same 100 TB moral as the session
    pin: clamp or filter pre-epoch timestamps BEFORE streaming dedup."""
    stream = jobs.read_events_stream(spark, time_extremes_stream_dir)
    jobs.run_to_memory(
        jobs.dedup_within_watermark(stream), "te_dedup", output_mode="append"
    )
    got = {r["event_id"] for r in spark.table("te_dedup").collect()}
    assert got == {5, 8, 9, 10, 11, 12, 13, 14, 16}
