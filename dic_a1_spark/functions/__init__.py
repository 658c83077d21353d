from dic_a1_spark.functions.text import (  # noqa: F401
    chi2_expr,
    normalize_text,
    remove_stopwords,
    tokenize,
    tokens_distinct,
)
