"""Shared constants.

``TOKEN_CHARS`` reproduces the reference tokenizer's translate table
verbatim (reference: src/wordCountJob.py:51) — the characters mapped to a
space before whitespace-splitting. Note ``<`` and ``>`` are deliberately
absent (they survive tokenization in the reference; SURVEY.md P3).

``STOPWORDS`` is this engine's deterministic stopword list. The reference
ships a 596-line stopwords.txt side file (src/data/stopwords.txt) loaded
into a set per mapper (src/wordCountJob.py:41-48); here the list is a
broadcast-joined constant so the Spark query and the DuckDB oracle share
one source of truth.
"""

from __future__ import annotations

# Verbatim from reference src/wordCountJob.py:51 (punctuation, digits, tab,
# apostrophe — all become spaces before tokenization).
TOKEN_CHARS: str = '()[]{}.!?,;:+=-_"~#@&*%€$§/\\1234567890\t' + "'"

# Deterministic engine stopword list (lowercase). Kept small and stable so
# both the Spark plan and the SQL oracle embed the identical set.
STOPWORDS: tuple[str, ...] = (
    "a",
    "an",
    "and",
    "in",
    "is",
    "it",
    "of",
    "or",
    "the",
    "to",
)

# Top-k cutoff for the chi-square ranking (reference: src/chiSquaredJob.py:105
# takes the top 75 per category).
CHI2_TOP_K: int = 75

# Table names the driver materializes per scale factor (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Whitespace-splitting regexes matching Python's str.split() semantics
# (the reference tokenizer, src/wordCountJob.py:75): Python splits on every
# character where str.isspace() is true = Unicode White_Space plus the
# \x1C-\x1F separators. Java's bare \s and RE2's \s are ASCII-only, so both
# engines need the explicit class.
SPARK_WS_REGEX: str = r"[\s\p{IsWhite_Space}\x1C-\x1F]+"
DUCKDB_WS_REGEX: str = (
    r"[\s\x0B\x1C-\x1F\x{0085}\x{00A0}\p{Zs}\x{2028}\x{2029}]+"
)


def duckdb_token_char_class() -> str:
    """The TOKEN_CHARS set as a DuckDB/RE2 regex character class."""
    # Escape regex-significant characters inside a class: ] \ ^ - [
    out = []
    for ch in TOKEN_CHARS:
        if ch in r"[]\^-":
            out.append("\\" + ch)
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "[" + "".join(out) + "]"


# Sentinel for the final-sigma mirror below. Not a letter, unaffected by
# lower(), and — unlike the private-use U+E000 it replaces (ADVICE r11:
# private-use characters DO occur in real web scrapes, and the mirror
# would have silently rewritten them to σ/ς) — U+FDD0 is a Unicode
# NONCHARACTER, permanently reserved for internal use and excluded from
# conformant interchange, so corpus text cannot legitimately carry it.
_SIGMA_SENTINEL = "\ufdd0"

# RE2 character-class bodies mirroring the two predicates of the JDK/ICU
# Final_Sigma walk (pinned empirically against Spark's lower(), see
# duckdb_lower_sql). Kept as raw "'"-bearing strings; SQL-escaped at use.
#
# Case_Ignorable ~= gc in {Mn, Me, Cf, Lm, Sk} + Word_Break MidLetter
# (: U+00B7 U+0387 U+055F U+05F4 U+2027 U+FE13 U+FE55 U+FF1A) + MidNumLet
# (. U+2018 U+2019 U+2024 U+FE52 U+FF07 U+FF0E) + Single_Quote (').
# Note Mc (spacing marks) is deliberately NOT here: Java treats Mc as a
# walk-stopping non-cased character (probe 'ΑऻΣ' -> 'αऻσ').
_CASE_IGNORABLE_CC = (
    "\\p{Mn}\\p{Me}\\p{Cf}\\p{Lm}\\p{Sk}"
    ":\\x{00B7}\\x{0387}\\x{055F}\\x{05F4}\\x{2027}\\x{FE13}\\x{FE55}\\x{FF1A}"
    ".\\x{2018}\\x{2019}\\x{2024}\\x{FE52}\\x{FF07}\\x{FF0E}'"
)
# Cased ~= gc in {Lu, Ll, Lt} + Other_Uppercase + Other_Lowercase, MINUS
# anything already Case_Ignorable (the walk checks ignorable FIRST, so
# e.g. U+02B0 MODIFIER SMALL H — Lm and Other_Lowercase — is skipped,
# never a decider). The non-Lu/Ll/Lt, non-ignorable cased ranges are
# U+00AA/U+00BA ordinals, Roman numerals U+2160-217F, circled letters
# U+24B6-24E9, squared/negative-circled Latin capitals U+1F130-1F189.
_CASED_CC = (
    "\\p{Lu}\\p{Ll}\\p{Lt}"
    "\\x{00AA}\\x{00BA}\\x{2160}-\\x{217F}\\x{24B6}-\\x{24E9}"
    "\\x{1F130}-\\x{1F149}\\x{1F150}-\\x{1F169}\\x{1F170}-\\x{1F189}"
    + _SIGMA_SENTINEL
)


def duckdb_lower_sql(col: str) -> str:
    """DuckDB expression matching Spark's ``lower()`` (Java/ICU full
    Unicode casing) on the inputs where utf8proc's per-codepoint mapping
    forks from it:

    - U+0130 LATIN CAPITAL I WITH DOT ABOVE lowercases to ``i`` +
      U+0307 combining dot in Java (TWO code points); DuckDB's utf8proc
      gives bare ``i``. Mirrored by substituting the expansion BEFORE
      lower (the expansion is a lower() fixed point).
    - Greek capital sigma: Java applies the Unicode Final_Sigma rule;
      utf8proc maps every ``Σ`` → ``σ``. Mirrored by swapping ``Σ`` for
      a noncharacter sentinel pre-lower, then resolving each sentinel
      positionally with the rule's REAL contexts (ADVICE r11 — the old
      ``\\p{L}``/``\\p{M}`` stand-ins forked on ``漢Σ``/``אΣ``/``ΑΣ'Β``):
      ``ς`` iff preceded by [cased][case-ignorable]* and followed by
      [case-ignorable]*(end | non-cased-non-ignorable), else ``σ``, with
      the class bodies above (``_CASED_CC`` / ``_CASE_IGNORABLE_CC``)
      mirroring the JDK/ICU predicates: ignorable is checked BEFORE
      cased, Mc marks stop the walk, and digits / Lo letters (Hebrew,
      CJK, kana) stop the walk as non-cased.

    Everything else in Unicode SpecialCasing.txt is an UPPER/TITLE
    expansion (ß→SS, ﬁ→FI, …) or locale-specific (tr/az/lt) and does not
    affect root-locale lower(). Pinned empirically against Spark over an
    adversarial battery in tests/test_degenerate_corpus.py plus an
    8K-string fuzz over every context class (Mn/Mc/Me/Cf/Lm/Sk,
    MidLetter/MidNumLet/quotes, other-cased ordinals/Roman/circled, Lo
    scripts, digits) — zero forks (r12 session)."""
    ign = _CASE_IGNORABLE_CC.replace("'", "''")
    cased = _CASED_CC
    s = f"replace(replace({col}, 'İ', 'i̇'), 'Σ', '{_SIGMA_SENTINEL}')"
    s = f"lower({s})"
    s = (
        f"regexp_replace({s}, "
        f"'([{cased}][{ign}]*){_SIGMA_SENTINEL}"
        f"([{ign}]*(?:$|[^{cased}{ign}]))', '\\1ς\\2', 'g')"
    )
    return f"replace({s}, '{_SIGMA_SENTINEL}', 'σ')"


def duckdb_tokens_sql(text_col: str = "text") -> str:
    """DuckDB expression producing the SAME token array as
    ``functions.text.tokenize`` over ``text_col`` — lower (via the
    Java-casefold mirror ``duckdb_lower_sql``), translate the token
    charset to spaces, split on the unicode-whitespace class, drop
    empties. The SINGLE source of truth for every oracle's tokenizer:
    oracle parity with the Spark tokenizer is the correctness foundation
    of the hash-gated queries, so the expression must never fork per
    module (it was copy-pasted six times before this helper)."""
    cc = duckdb_token_char_class().replace("'", "''")
    return (
        f"list_filter(regexp_split_to_array(regexp_replace("
        f"{duckdb_lower_sql(text_col)},"
        f" '{cc}', ' ', 'g'), '{DUCKDB_WS_REGEX}'), w -> w <> '')"
    )


def sql_stopword_list() -> str:
    """STOPWORDS rendered as a SQL IN-list body: 'a','an',..."""
    return ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS)


def duckdb_tokenset_md5_sql(text_col: str = "text") -> str:
    """DuckDB expression for the ORDER-INSENSITIVE content identity —
    md5 over the sorted distinct token set, space-joined — matching
    Spark's ``dedup.tokenset_hash`` (md5(concat_ws(' ',
    array_sort(array_distinct(tokens))))) on EVERY input including the
    empty token set: DuckDB's ``array_to_string([], ' ')`` is NULL
    while Spark's ``concat_ws`` is ``''``, so without the coalesce the
    two engines fork exactly on empty/whitespace/punctuation-only
    documents (found by tests/test_r8_oracle_fuzz.py; the driver corpus
    never triggers it). The SINGLE source of truth for every oracle's
    tokenset identity — it was copy-pasted six times before this
    helper."""
    return (
        f"md5(coalesce(array_to_string(list_sort(list_distinct("
        f"{duckdb_tokens_sql(text_col)})), ' '), ''))"
    )
