from dic_a1_spark.sources.readers import (  # noqa: F401
    load_table,
    load_tables,
    read_reviews_json,
    read_stopwords,
    REVIEW_SCHEMA,
)
from dic_a1_spark.sources.sinks import (  # noqa: F401
    format_counters_line,
    parse_counters_line,
    write_raw_text,
)
