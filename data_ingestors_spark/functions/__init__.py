from data_ingestors_spark.functions.nulls import normalize_nulls  # noqa: F401
from data_ingestors_spark.functions.casts import conform_types, bool_from_vocab  # noqa: F401
from data_ingestors_spark.functions.label_policy import label_bucket_col, bucket_label  # noqa: F401
