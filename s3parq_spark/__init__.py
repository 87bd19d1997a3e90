"""s3parq_spark — a PySpark-native engine with the query and data-processing
capabilities of IntegriChain1/s3parq (reference at /root/reference, studied
for behavior only; architecture is Spark-first, see SURVEY.md §7).

Public surface mirrors the reference's ``s3parq/__init__.py:3-8`` plus the
importable module members, and adds the large-scale pipeline operators
(dedup, similarity, text analysis, multimodal, streaming) under
``s3parq_spark.operators`` / ``s3parq_spark.streaming``.
"""

from .fetch import (
    attach,
    fetch_at,
    fetch_at_tag,
    fetch_changes,
    list_versions,
    MissingS3ParqMetadata,
    fetch,
    fetch_diff,
    fetch_diff_path,
    dataset_files,
    dataset_history,
    dataset_refs,
    dataset_rowcount,
    partition_rowcounts,
    fetch_path,
    get_all_files_list,
    get_all_partition_values,
    get_diff_partition_values,
    get_max_partition_value,
)
from .export import export_jsonl, read_jsonl
from .sources import read_csv
from .publish import (
    PendingAuditError,
    TagPinnedError,
    apply_change_feed,
    compact_dataset,
    custom_publish,
    delete_tag,
    delete_where,
    discard_snapshot,
    drop_column,
    eq_delete_append,
    expire_snapshots,
    merge_upsert,
    overwrite_partitions,
    publish,
    publish_bucketed,
    publish_path,
    promote_snapshot,
    rename_column,
    repartition_dataset,
    restore_dataset,
    tag_snapshot,
    list_tags,
    vacuum_dataset,
    validate_redshift_params,
)
from .text_index import (
    append_to_text_index,
    build_text_index,
    reindex_documents,
    remove_documents,
    repair_index_stats,
    search_text_index,
)
from .ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    index_drift,
    remove_vectors,
    search_ivf_index,
    upsert_vectors,
)
from .maintenance import dataset_health, maintain_dataset
from .views import create_aggregate, refresh_aggregate
from .session import get_spark
from .session_helper import SessionHelper

__all__ = [
    "MissingS3ParqMetadata",
    "PendingAuditError",
    "TagPinnedError",
    "append_to_ivf_index",
    "append_to_text_index",
    "apply_change_feed",
    "attach",
    "build_ivf_index",
    "build_text_index",
    "index_drift",
    "remove_vectors",
    "search_ivf_index",
    "upsert_vectors",
    "compact_dataset",
    "delete_where",
    "eq_delete_append",
    "overwrite_partitions",
    "reindex_documents",
    "remove_documents",
    "repair_index_stats",
    "repartition_dataset",
    "restore_dataset",
    "search_text_index",
    "create_aggregate",
    "custom_publish",
    "dataset_files",
    "dataset_history",
    "dataset_refs",
    "dataset_rowcount",
    "delete_tag",
    "discard_snapshot",
    "drop_column",
    "expire_snapshots",
    "export_jsonl",
    "fetch",
    "fetch_at",
    "fetch_at_tag",
    "fetch_changes",
    "fetch_diff",
    "fetch_diff_path",
    "fetch_path",
    "get_all_files_list",
    "get_all_partition_values",
    "get_diff_partition_values",
    "get_max_partition_value",
    "dataset_health",
    "get_spark",
    "list_versions",
    "maintain_dataset",
    "merge_upsert",
    "partition_rowcounts",
    "promote_snapshot",
    "publish",
    "read_csv",
    "read_jsonl",
    "refresh_aggregate",
    "publish_bucketed",
    "rename_column",
    "tag_snapshot",
    "list_tags",
    "publish_path",
    "vacuum_dataset",
    "SessionHelper",
    "validate_redshift_params",
]

__version__ = "0.1.0"
