from data_ingestors_spark.operators.asof import asof_join  # noqa: F401
from data_ingestors_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    normalized_dedup,
    minhash_signatures,
    minhash_near_duplicates,
    neardup_clusters,
    simhash,
    simhash_near_duplicates,
    ngram_jaccard_pairs,
)
from data_ingestors_spark.operators.joins import salted_join  # noqa: F401
from data_ingestors_spark.operators.layout import morton_key, zorder_write  # noqa: F401
from data_ingestors_spark.operators.robust import (  # noqa: F401
    geomean_by_group,
    mad_outlier_stats,
)
from data_ingestors_spark.operators.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_numpy,
    ivf_ann_topk,
    pq_ann_topk,
    ivfpq_ann_topk,
    lsh_ann_topk,
)
from data_ingestors_spark.operators.rollup import (  # noqa: F401
    read_rollup,
    rollup_upsert,
)
from data_ingestors_spark.operators.text import (  # noqa: F401
    chunk_documents,
    winnowing_fingerprints,
    unigram_logprob,
    text_stats,
    language_id,
    token_count,
    fingerprint,
    quality_score,
    pii_redact,
)
