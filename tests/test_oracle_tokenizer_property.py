"""Property test for the ORACLE side of the tokenizer.

The DuckDB oracle SQL rebuilds the reference tokenizer from two hand-rolled
pieces — a regex character class escaped by config.duckdb_token_char_class
and the unicode whitespace class — and a bug there would silently weaken
every text-query correctness gate. Hypothesis drives arbitrary strings
through the DuckDB expression and the plain-Python reference tokenizer;
they must agree exactly. No Spark involved, so hundreds of examples run in
seconds."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from dic_a1_spark.config import (
    DUCKDB_WS_REGEX,
    TOKEN_CHARS,
    duckdb_token_char_class,
)
from tests.reference_impl import tokenize as ref_tokenize

_CC = duckdb_token_char_class().replace("'", "''")
_SQL = (
    "SELECT list_filter(regexp_split_to_array("
    f"regexp_replace(lower(?), '{_CC}', ' ', 'g'), '{DUCKDB_WS_REGEX}'),"
    " w -> w <> '')"
)

_CON = duckdb.connect()

# Mix of: the translate set itself, survivors, letters, unicode whitespace,
# non-latin scripts, emoji, control separators.
_ALPHABET = st.sampled_from(
    list(TOKEN_CHARS)
    + list("<>|^`abcXYZ")
    + list("éÉßñ中文한국")
    + [" ", " ", " ", " ", "　", "\x1c", "\x85"]
    + ["\U0001F600"]
)


@given(st.text(alphabet=_ALPHABET, max_size=60))
@settings(max_examples=300, deadline=None)
def test_duckdb_oracle_tokenizer_matches_reference(s: str):
    (arr,) = _CON.execute(_SQL, [s]).fetchone()
    assert set(arr) == ref_tokenize(s), repr(s)
