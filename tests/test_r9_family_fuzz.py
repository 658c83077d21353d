"""Round-9 hostile-corpus fuzz for the three oracle families VERDICT r8
flagged as un-fuzzed: the lm.py closed-form NTILE, the windowed events
percentile/gapfill oracles, and the goldens byte-formatting surface.

Technique as in tests/test_r7_oracle_fuzz / test_r8_oracle_fuzz /
test_r9_oracle_fuzz: build a corpus whose structure targets the
family's fork-prone construct, then run the registered Spark query and
its DuckDB oracle side-by-side through the driver-replica gate.

Fork-prone constructs targeted here:
- NTILE closed form: corpora SMALLER than PPL_BUCKETS (q = 0 — both
  engines must emit zero decile rows), exactly PPL_BUCKETS docs, and a
  corpus where one avg_bits value spans several decile boundaries
  (identical texts), so the doc_id tiebreak inside the tied run must
  reproduce genuine NTILE bucket splits.
- events percentiles/gapfill: percentile_disc(0.5) over all-equal and
  even-count value sets, a single-event type, events landing EXACTLY on
  hour boundaries (date_trunc/window edge), a type observed only in the
  last hour (LOCF stays NULL for its whole leading axis), and a long
  empty gap in the middle of the global hour axis. Values are
  quarter-quantized (exact in binary) so groupBy sums are
  order-independent — the fuzz probes tie/boundary semantics, not float
  association, which round(sum(), 2) already pins on the driver corpus.
- goldens formatting: format_golden_lines ties (equal chi2 -> word
  order), hostile words through the dict repr (quotes, backslashes,
  non-ASCII), float reprs that LOOK integral (2.0) or exponent-form
  (1e+16), plus JSON-KV sink -> stage-1 reader and counters-line
  roundtrips on the same hostile vocabulary.
"""

from __future__ import annotations

import random
import shutil
from datetime import datetime, timedelta
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dic_a1_spark.config import TABLES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare

# --------------------------------------------------------------------------
# lm.py closed-form NTILE
# --------------------------------------------------------------------------

_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "rare1", "rare2", "rare3",
]


def _doc_corpus(texts: list[str], base) -> str:
    out = base
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", Path(out) / f"{t}.parquet")
    rng = random.Random(0x9A)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [rng.choice(["en", "de"]) for _ in texts], pa.string()
            ),
            "source": pa.array(
                [f"s{rng.randint(0, 3)}" for _ in texts], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, Path(out) / "documents.parquet")
    return str(out)


def _mixed_texts(rng: random.Random, n: int) -> list[str]:
    return [
        " ".join(rng.choices(_WORDS, k=rng.randint(1, 12))) for _ in range(n)
    ]


@pytest.fixture(scope="module")
def lm_tiny_dir(tmp_path_factory):
    # 5 docs < PPL_BUCKETS: q = 0, no decile rows in either engine.
    rng = random.Random(0x9B)
    return _doc_corpus(_mixed_texts(rng, 5), tmp_path_factory.mktemp("lm_tiny"))


@pytest.fixture(scope="module")
def lm_exact_dir(tmp_path_factory):
    # exactly PPL_BUCKETS docs: every decile has exactly one member.
    rng = random.Random(0x9C)
    return _doc_corpus(_mixed_texts(rng, 10), tmp_path_factory.mktemp("lm_exact"))


@pytest.fixture(scope="module")
def lm_ties_dir(tmp_path_factory):
    # 47 docs (q=4, r=7 — uneven buckets) where 23 share ONE text (one
    # avg_bits value spanning ~5 decile boundaries: the doc_id tiebreak
    # inside the run must reproduce NTILE's first-r-larger split), plus
    # empty and one-token docs at both ends of the avg_bits range.
    rng = random.Random(0x9D)
    texts = ["alpha beta alpha beta gamma"] * 23
    texts += _mixed_texts(rng, 20)
    texts += ["", "alpha", "rare3 rare2 rare1", "   "]
    return _doc_corpus(texts, tmp_path_factory.mktemp("lm_ties"))


_LM_QUERIES = ["ppl_decile_census", "text_bigram_surprisal", "lm_crossentropy_by_source"]


@pytest.mark.parametrize("query", _LM_QUERIES)
@pytest.mark.parametrize("corpus", ["lm_tiny_dir", "lm_exact_dir", "lm_ties_dir"])
def test_lm_family_parity_on_hostile_corpora(spark, request, corpus, query):
    from dic_a1_spark.operators import lm

    sf_dir = request.getfixturevalue(corpus)
    compare(spark, lm.ORACLES[query], lm.QUERIES[query], sf_dir, query)


def test_decile_census_empty_below_bucket_count(spark, lm_tiny_dir):
    from dic_a1_spark.operators import lm

    assert lm.ppl_decile_census(spark, lm_tiny_dir).count() == 0


# --------------------------------------------------------------------------
# events percentile / gapfill / hour-boundary oracles
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("ev_fuzz")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", Path(out) / f"{t}.parquet")

    t0 = datetime(2024, 3, 1, 0, 0, 0)
    rows: list[tuple[datetime, int, str, float]] = []

    # type "tie": 40 events, ALL values equal -> percentile_disc over a
    # fully tied, even-count set; spread over 4 hours with several events
    # EXACTLY on hour boundaries (date_trunc / tumbling-window edges).
    for i in range(40):
        ts = t0 + timedelta(minutes=6 * i)  # every 6 min -> :00 hits
        rows.append((ts, 100 + i % 5, "tie", 42.0))
    # type "mix": 21 events (odd), quarter-quantized values with
    # duplicates and a -0.0/0.0 pair; one user emits two events at the
    # SAME microsecond timestamp (min/first semantics on a tied key).
    vals = [0.25, 0.25, -0.0, 0.0, 1.5, 1.5, 1.5, 2.75, 2.75, 100.25,
            100.25, 7.5, 7.5, 7.5, 7.5, 3.25, 3.25, 9.75, 9.75, 0.5, 0.5]
    same_ts = t0 + timedelta(hours=1, minutes=13, seconds=37, microseconds=123456)
    for i, v in enumerate(vals):
        ts = same_ts if i < 2 else t0 + timedelta(hours=2, minutes=3 * i)
        rows.append((ts, 200, "mix", v))
    # type "solo": a single event, landing exactly on an hour boundary.
    rows.append((t0 + timedelta(hours=3), 300, "solo", 5.25))
    # long empty gap: nothing between hour 4 and hour 60.
    # type "late": observed ONLY in the final hour -> its LOCF average
    # stays NULL across the entire leading axis.
    for i in range(3):
        rows.append((t0 + timedelta(hours=60, minutes=10 * i), 400, "late", 1.25))
    # exact-session-gap pair (10 minutes apart to the microsecond) —
    # re-exercises the r8 boundary pin on a fresh corpus.
    rows.append((t0 + timedelta(hours=60, minutes=20), 500, "tie", 2.5))
    rows.append((t0 + timedelta(hours=60, minutes=30), 500, "tie", 2.5))

    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(
                ['{"k": %d}' % (i % 9) for i in range(len(rows))], pa.string()
            ),
        }
    )
    pq.write_table(tbl, Path(out) / "events.parquet")
    return str(out)


_EVENT_QUERIES = [
    "events_value_percentiles",
    "events_gapfill_hourly",
    "events_hour_of_day_matrix",
    "events_first_per_user_type",
    "events_session_windows",
    "events_tumbling_hour",
]


@pytest.mark.parametrize("query", _EVENT_QUERIES)
def test_events_family_parity_on_hostile_corpus(spark, events_dir, query):
    from dic_a1_spark.operators import events

    compare(spark, events.ORACLES[query], events.QUERIES[query], events_dir, query)


def test_gapfill_late_type_leading_nulls(spark, events_dir):
    """The 'late' type must have NULL ffill_avg_value for every hour
    before its first observation and a non-NULL value from then on."""
    from dic_a1_spark.operators import events

    rows = [
        r
        for r in events.events_gapfill_hourly(spark, events_dir).collect()
        if r["event_type"] == "late"
    ]
    rows.sort(key=lambda r: r["hour"])
    assert len(rows) > 50  # the axis spans the 60-hour range
    assert all(r["ffill_avg_value"] is None for r in rows[:-1])
    assert rows[-1]["ffill_avg_value"] is not None


# --------------------------------------------------------------------------
# goldens byte-formatting
# --------------------------------------------------------------------------

_HOSTILE_WORDS = [
    "plain",
    "quote's",
    'double"quote',
    "back\\slash",
    "uniéode",
    "<tag>",
    "a<b",
]


def test_format_golden_lines_matches_reference_semantics():
    """format_golden_lines must render exactly what the reference's
    ``str(dict)`` emits (src/chiSquaredJob.py:110-127): chi2 descending,
    word-ascending tiebreak, Python repr of keys and values — verified
    here against a literal reimplementation on hostile words and float
    shapes (integral 2.0, exponent 1e+16, subnormal, long mantissa)."""
    from dic_a1_spark.operators.chisq import format_golden_lines

    chi2s = [2.0, 1e16, 5e-324, 0.1 + 0.2, 123456.78901234567, 2.0, 2.0]
    topk = [
        {"category": "CatA", "word": w, "chi2": c}
        for w, c in zip(_HOSTILE_WORDS, chi2s)
    ]
    vocab = sorted(_HOSTILE_WORDS)
    lines = format_golden_lines(topk, vocab)

    ordered = sorted(
        [(r["word"], r["chi2"]) for r in topk], key=lambda t: (-t[1], t[0])
    )
    assert lines[0] == "CatA\t" + str(dict(ordered))
    assert lines[-1] == str(sorted(set(vocab)))
    # Ties at chi2 == 2.0 appear word-ascending inside the dict repr.
    tied = [w for w, c in ordered if c == 2.0]
    assert tied == sorted(tied)


def test_json_kv_sink_reader_roundtrip_hostile_words(spark, tmp_path):
    """S5 sink -> S4 reader roundtrip on words that stress the JSON
    escaping (quotes, backslashes, non-ASCII) and LongType counts at the
    2^53 double-precision edge."""
    from dic_a1_spark.operators.goldens import read_wordcount_kv
    from dic_a1_spark.sources.sinks import write_json_kv

    data = [
        (w, i, (1 << 53) + i) for i, w in enumerate(_HOSTILE_WORDS)
    ]
    df = spark.createDataFrame(data, ["word", "CatA", "CatB"])
    path = str(tmp_path / "kv")
    write_json_kv(df, "word", ["CatA", "CatB"], path)
    back = read_wordcount_kv(spark, path)
    got = {(r["word"], r["category"]): r["n"] for r in back.collect()}
    for w, a, b in data:
        assert got[(w, "CatA")] == a
        assert got[(w, "CatB")] == b
    assert len(got) == 2 * len(data)


def test_counters_line_roundtrip_hostile_categories():
    from dic_a1_spark.sources.sinks import format_counters_line, parse_counters_line

    cats = {w: i + 1 for i, w in enumerate(_HOSTILE_WORDS)}
    line = format_counters_line(sum(cats.values()), cats)
    total, back = parse_counters_line(line)
    assert total == sum(cats.values())
    assert back == cats
