from etl_sprint_2_5_spark.functions.kernel import (  # noqa: F401
    clean_sentinels,
    coalesce_empty_array,
    csv_to_array,
    epoch_zero,
    iso_ts,
    json_ids,
    pluck,
    to_double,
    uuid_sentinel,
)
from etl_sprint_2_5_spark.functions.text import (  # noqa: F401
    char_ngrams,
    hash_bucket,
    normalize_text,
    tokenize,
    word_shingles,
)
