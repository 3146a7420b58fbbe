from data_ingestors_spark.streaming.events import (  # noqa: F401
    stream_events,
    windowed_counts_stream,
    session_stream,
    dedup_stream,
    attribution_stream,
    enrich_stream,
    stream_upsert,
    stream_rollup,
    stateful_sessions,
    run_stream_to_memory,
)
from data_ingestors_spark.streaming.neardup import (  # noqa: F401
    compact_embedding_neardup_index,
    compact_neardup_index,
    embedding_neardup_fold_batch,
    incremental_dedup_fold_batch,
    neardup_fold_batch,
    read_incremental_dedup,
    stream_embedding_neardup,
    stream_incremental_dedup,
    stream_neardup,
)
from data_ingestors_spark.streaming.fuzzy import (  # noqa: F401
    fuzzy_match_fold_batch,
    stream_fuzzy_match,
)
from data_ingestors_spark.streaming.frequency import (  # noqa: F401
    compact_counts,
    counts_fold_batch,
    read_heavy_hitters,
    stream_heavy_hitters,
)
from data_ingestors_spark.streaming.digest import (  # noqa: F401
    digest_fold_batch,
    read_stream_quantiles,
    stream_quantile_digest,
)
from data_ingestors_spark.streaming.drift import (  # noqa: F401
    psi_baseline,
    read_psi,
    stream_psi_fold,
)
from data_ingestors_spark.streaming.monitors import (  # noqa: F401
    profile_baseline,
    read_freshness,
    read_profile_drift,
    stream_freshness_fold,
    stream_profile_fold,
)
