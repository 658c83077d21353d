from __future__ import annotations

from dic_a1_spark.operators import events as batch_events
from dic_a1_spark.streaming import jobs
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_stream_tumbling_matches_batch(spark):
    stream = jobs.read_events_stream(spark, SF_SMOKE)
    jobs.run_to_memory(jobs.tumbling_counts(stream), "t_tumbling")
    got = spark.table("t_tumbling")
    want = batch_events.events_tumbling_hour(spark, SF_SMOKE)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_sessions_match_batch(spark):
    stream = jobs.read_events_stream(spark, SF_SMOKE)
    jobs.run_to_memory(jobs.session_counts(stream), "t_sessions")
    got = spark.table("t_sessions")
    want = batch_events.events_session_windows(spark, SF_SMOKE).select(
        "user_id", "session_start", "n_events"
    )
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_within_watermark(spark):
    stream = jobs.read_events_stream(spark, SF_SMOKE)
    jobs.run_to_memory(
        jobs.dedup_within_watermark(stream), "t_dedup", output_mode="append"
    )
    got = spark.table("t_dedup")
    # one row per (user_id, event_type) observed
    want_keys = (
        batch_events.events_first_per_user_type(spark, SF_SMOKE)
        .select("user_id", "event_type")
    )
    assert got.count() == want_keys.count()
    assert _rows(got.select("user_id", "event_type"), ["user_id", "event_type"]) == \
        _rows(want_keys, ["user_id", "event_type"])


def test_checkpointed_file_sink_is_exactly_once(spark, tmp_path):
    """Restarting a checkpointed query against an unchanged source must
    process nothing new — the offset log prevents re-emission."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = jobs.read_events_stream(spark, SF_SMOKE)
    flat = stream.select("event_id", "user_id", "event_type")
    jobs.run_to_files(flat, out, ckpt)
    first = spark.read.parquet(out).count()

    # restart: same source, same checkpoint -> no duplicates
    stream2 = jobs.read_events_stream(spark, SF_SMOKE)
    jobs.run_to_files(
        stream2.select("event_id", "user_id", "event_type"), out, ckpt
    )
    again = spark.read.parquet(out)
    assert again.count() == first
    assert again.select("event_id").distinct().count() == first


def test_stream_stream_interval_join_matches_batch(spark):
    from pyspark.sql import functions as F

    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_events_stream(spark, SF_SMOKE)
    jobs.run_to_memory(
        jobs.clicks_before_purchases(stream), "t_ssjoin", output_mode="append"
    )
    got = spark.table("t_ssjoin").select("purchase_id", "click_id")

    e = load_table(spark, SF_SMOKE, "events")
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
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select("purchase_id", "click_id")
    cols = ["purchase_id", "click_id"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_stateful_running_stats(spark):
    from pyspark.sql import functions as F

    stream = jobs.read_events_stream(spark, SF_SMOKE)
    jobs.run_to_memory(
        jobs.running_user_stats(stream), "t_state", output_mode="update"
    )
    got = spark.table("t_state")
    # with a single availableNow batch the final state equals the batch agg
    from dic_a1_spark.sources.readers import load_table

    want = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
    )
    cols = ["user_id", "n_events", "max_value"]
    # keep the last update per user (updates may appear once per batch)
    last = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value")
    )
    assert _rows(last, cols) == _rows(want, cols)


def test_stream_funnel_matches_batch(spark):
    """availableNow replay of the stateful funnel equals the batch
    events_funnel_depth on the same files (full-history parity).

    Parity holds because this replay delivers each user's full history
    in ONE ts-ordered micro-batch (the funnel state machine cannot
    rewind across batches — see funnel_depths' ORDERING REQUIREMENT).
    Production parity needs a per-user event-time-ordered source."""
    from pyspark.sql import functions as F

    from dic_a1_spark.operators.events import events_funnel_depth

    stream = jobs.read_events_stream(spark, SF_SMOKE)
    jobs.run_to_memory(
        jobs.funnel_depths(stream), "t_funnel", output_mode="update"
    )
    got = spark.table("t_funnel")
    # keep the last update per user: funnel depth is monotone, so max
    # depth row is the final state; timestamps ride along via struct max
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
    want = events_funnel_depth(spark, SF_SMOKE).withColumn(
        "funnel_depth", F.col("funnel_depth").cast("long")
    )
    cols = ["user_id", "view_ts", "click_ts", "purchase_ts", "funnel_depth"]
    assert _rows(last, cols) == _rows(want, cols)


def test_stream_incremental_admission_matches_batch(spark):
    """availableNow replay of the stream-static admission equals the
    batch dedup_incremental_keep on the same files — exactly, including
    which doc_id represents each duplicate set: the stateful min-tracker
    is order-free, so parity holds under ANY delivery order or input
    split layout (unlike a first-arrival dropDuplicates). Updates may
    appear once per micro-batch; the final (min-doc_id) state is the
    last update per hash."""
    from pyspark.sql import functions as F

    from dic_a1_spark.operators.incremental import dedup_incremental_keep

    stream = jobs.read_increment_stream(spark, SF_SMOKE)
    jobs.run_to_memory(
        jobs.incremental_admission(stream, spark, SF_SMOKE),
        "t_inc_admit",
        output_mode="update",
    )
    last = (
        spark.table("t_inc_admit")
        .groupBy("content_hash")
        .agg(
            F.min(
                F.struct("doc_id", "lang", "source", "n_chars")
            ).alias("s")
        )
        .select("content_hash", "s.doc_id", "s.lang", "s.source", "s.n_chars")
    )
    got = {
        (r["doc_id"], r["content_hash"], r["lang"], r["source"], r["n_chars"])
        for r in last.collect()
    }
    want = {
        (r["doc_id"], r["content_hash"], r["lang"], r["source"], r["n_chars"])
        for r in dedup_incremental_keep(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert got, "no admissions — increment residue class empty?"


def test_stream_dsir_scores_match_batch(spark):
    """Streaming DSIR scoring (stateless map against the collected
    weight map) must reproduce the batch per-document scores exactly
    when replaying the same corpus the weights were fit on."""
    from dic_a1_spark.operators.dsir import dsir_logratio_weights

    stream = jobs.read_documents_stream(spark, SF_SMOKE)
    jobs.run_to_memory(
        jobs.dsir_stream_scores(stream, spark, SF_SMOKE),
        "t_dsirscores",
        output_mode="append",
    )
    got = _rows(
        spark.table("t_dsirscores"),
        ["doc_id", "n_feats", "score_fp", "avg_fp"],
    )
    want = _rows(
        dsir_logratio_weights(spark, SF_SMOKE).select(
            "doc_id", "n_feats", "score_fp", "avg_fp"
        ),
        ["doc_id", "n_feats", "score_fp", "avg_fp"],
    )
    assert got == want and got


def test_stream_cdc_census_matches_batch(spark):
    """The round-6 CDC chunk census, streamed: zero-exchange chunk
    construction shared with the batch operator, streaming groupBy in
    complete mode equals a batch regroup of the chunk table exactly."""
    from pyspark.sql import functions as F

    from dic_a1_spark.operators import cdc
    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_documents_stream(spark, SF_SMOKE)
    jobs.run_to_memory(jobs.cdc_chunk_census(stream), "t_cdccensus")
    got = _rows(
        spark.table("t_cdccensus"), ["chunk_hash", "n_tokens", "n_inst"]
    )
    want = _rows(
        cdc._chunks(load_table(spark, SF_SMOKE, "documents"))
        .groupBy("chunk_hash")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count("*").alias("n_inst"),
        ),
        ["chunk_hash", "n_tokens", "n_inst"],
    )
    assert got == want and got


def test_stream_line_census_matches_batch(spark):
    """The round-6 line-dedup census, streamed: map-only line
    construction shared with the batch operator, streaming groupBy in
    complete mode equals the batch instance census exactly."""
    from dic_a1_spark.operators import linededup

    stream = jobs.read_documents_stream(spark, SF_SMOKE)
    jobs.run_to_memory(jobs.line_instance_census(stream), "t_linecensus")
    got = _rows(spark.table("t_linecensus"), ["line_text", "n_inst"])
    want = _rows(
        linededup._census(linededup._lines(spark, SF_SMOKE)).select(
            "line_text", "n_inst"
        ),
        ["line_text", "n_inst"],
    )
    assert got == want and got


def test_stream_bm25_scores_match_batch(spark):
    """Streaming BM25 (stateless scoring against collected corpus
    statistics) must reproduce the batch scorer's per-document doubles
    EXACTLY when replaying the corpus the stats were fit on — the
    literal-substituted contribution expression is association-identical
    to the batch one."""
    from dic_a1_spark.operators.bm25 import BM25_QUERY, _scored
    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_documents_stream(spark, SF_SMOKE)
    jobs.run_to_memory(
        jobs.bm25_stream_scores(stream, spark, SF_SMOKE),
        "t_bm25scores",
        output_mode="append",
    )
    cols = ["doc_id", "dl", "n_hit_terms", "score"]
    got = _rows(spark.table("t_bm25scores"), cols)
    want = _rows(
        _scored(load_table(spark, SF_SMOKE, "documents"), BM25_QUERY), cols
    )
    assert got == want and got


def test_stream_embdecontam_matches_exact_bipartite(spark):
    """The streaming decontamination twin must reproduce the EXACT
    bipartite ground truth (its stated contract — unlike the registered
    IVF-blocked batch query): per training vector, flagged iff any
    round(cos, 4) >= threshold, n_hits exact, best hit = (max raw sim,
    ties to lowest bench id)."""
    import numpy as np

    from dic_a1_spark.operators.embdecontam import (
        EMBDECONTAM_MOD,
        EMBDECONTAM_SIM,
    )
    from dic_a1_spark.operators.similarity import _round4_ge_boundary
    from dic_a1_spark.sources.readers import load_table

    stream = jobs.read_embeddings_stream(spark, SF_SMOKE)
    jobs.run_to_memory(
        jobs.embdecontam_stream_flags(stream, spark, SF_SMOKE),
        "t_embdec",
        output_mode="append",
    )
    got = {
        r["vec_id"]: r for r in spark.table("t_embdec").collect()
    }

    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    is_b = (ids % EMBDECONTAM_MOD) == 0
    bids, B = ids[~is_b], V[~is_b]
    eids, E = ids[is_b], V[is_b]
    bo, eo = np.argsort(bids), np.argsort(eids)
    bids, B, eids, E = bids[bo], B[bo], eids[eo], E[eo]
    floor = _round4_ge_boundary(EMBDECONTAM_SIM)
    tacc = np.zeros(len(B))
    eacc = np.zeros(len(E))
    acc = np.zeros((len(B), len(E)))
    for d in range(V.shape[1]):  # the exact fold's dim order
        tacc += B[:, d] * B[:, d]
        eacc += E[:, d] * E[:, d]
        acc += B[:, d][:, None] * E[:, d][None, :]
    S = acc / (np.sqrt(tacc)[:, None] * np.sqrt(eacc)[None, :])

    assert set(got) == set(bids.tolist())
    n_flagged = 0
    for i, vid in enumerate(bids.tolist()):
        hits = S[i] >= floor
        r = got[vid]
        assert r["flagged"] == bool(hits.any()), vid
        assert r["n_hits"] == int(hits.sum()), vid
        if hits.any():
            n_flagged += 1
            masked = np.where(hits, S[i], -np.inf)
            j = int(np.argmax(masked))
            assert r["best_bench_id"] == int(eids[j]), vid
            assert r["best_sim_r"] == round(float(S[i][j]), 4) or abs(
                r["best_sim_r"] - float(S[i][j])
            ) < 5e-5, vid
        else:
            assert r["best_bench_id"] is None and r["best_sim_r"] is None
    assert 0 < n_flagged < len(bids), "flag gate must discriminate"
