"""dask_awkward_spark — a PySpark-native nested-data analytics engine.

Brand-new engine with the query/data-processing capabilities of
``dask-contrib/dask-awkward`` (reference surveyed in SURVEY.md), built
Spark-first: every operator compiles to DataFrame/Column expressions so
Catalyst (pruning, pushdown, codegen, AQE) does the optimization the
reference implements by hand.
"""

from .core import (
    NestedArray,
    PartitionCompatibility,
    Record,
    Scalar,
    align_many,
    from_column,
    from_lists,
    partition_compatibility,
)
from .session import get_spark, load_tables
from .sources.tables import load_table, load_table_hot, stream_table
from .plans import explain_str, necessary_columns, pushed_filters
from . import behaviors, config, testutils, types
from .behaviors import dask_method, dask_property, register_behavior
from .compat import (
    Array,
    backend,
    calculate_known_divisions,
    is_awkward_collection,
    compatible_partitions,
    fields,
    from_awkward,
    from_delayed,
    layout_to_jsonschema,
    map_partitions,
    report_necessary_buffers,
    report_necessary_columns,
    sample,
    to_dask_bag,
    to_delayed,
    to_list,
    with_field,
    without_field,
)
from .compat import typeof as type  # noqa: A001 — reference exports `type` too
from .sources.parquet import (
    compact_parquet,
    from_parquet,
    to_bucketed_table,
    to_parquet,
    to_zordered_parquet,
)
from .sources.json import from_json, to_json
from .sources.snapshot import (
    CommitBackend,
    set_commit_backend,
    snapshot_add_constraint,
    snapshot_apply_changes,
    SnapshotBatchReplayedError,
    SnapshotConflictError,
    SnapshotConstraintViolation,
    from_snapshot,
    snapshot_add_columns,
    snapshot_alter_column_type,
    snapshot_changes,
    snapshot_compact,
    snapshot_convert,
    snapshot_count,
    snapshot_create,
    snapshot_delete,
    snapshot_drop_column,
    snapshot_drop_constraint,
    snapshot_history,
    snapshot_maintain,
    snapshot_merge,
    snapshot_read,
    snapshot_rename_column,
    snapshot_restore,
    snapshot_scan_report,
    snapshot_files,
    snapshot_partitions,
    snapshot_set_partition_spec,
    snapshot_set_properties,
    snapshot_set_stats_columns,
    snapshot_tag,
    snapshot_tags,
    snapshot_delete_tag,
    snapshot_txn,
    snapshot_update,
    snapshot_vacuum,
    snapshot_version_at,
    snapshot_versions,
    snapshot_view,
    snapshot_write,
    stream_from_snapshot,
    stream_to_snapshot,
)
from .sources.sqlface import (
    snapshot_sql,
    snapshot_sql_script,
    snapshot_changes_view,
)
from .sources.catalog import (
    snapshot_catalog_register,
    snapshot_catalog_unregister,
    snapshot_catalog_rename,
    snapshot_catalog_lookup,
    snapshot_catalog_list,
    snapshot_catalog_tables,
    snapshot_catalog_views,
)
from .sources.storage import (
    ObjectCopyStorageBackend,
    PosixStorageBackend,
    StorageBackend,
    set_storage_backend,
)
from .sources.text import from_text
from .functions.strings import strings_astype
from .sources.datasource import (
    from_datasource,
    read_report,
    stream_from_datasource,
    stream_to_datasource,
    to_datasource,
)
from .sources.memory import (
    from_arrow,
    to_arrow,
    from_dask_array,
    from_map,
    to_dask_array,
    to_dataframe,
    to_local_iterator,
)
from .operators import reducers, structure
from .functions import hist, sketches, timeseries  # capability uplift namespaces
from .functions.hist import hist1d, hist2d, profile1d
from .functions.curation import (
    assign_split,
    cap_running_budget,
    contamination,
    deterministic_shuffle,
    pack_sequences,
    quota_sample,
)
from .functions.incremental import dedup_probe, incremental_dedup, minhash_bands
from .functions.simindex import (
    guard_bruteforce_query_side,
    ivf_cell,
    ivf_centroids,
    ivf_index_add,
    ivf_maintain,
    ivf_recall,
    ivf_retrain,
    ivf_search,
    ivf_stream_ingest,
    knn_bruteforce,
)
from .functions.sketches import hll_distinct, kmv_distinct
from .functions.vectors import (
    cosine_similarity,
    dequantize,
    dot,
    hyperplane_bits,
    l2_normalize,
    norm,
    quantize_int8,
)
from .functions.timeseries import asof_join, range_join, rollup_cascade, sessionize
from .functions import strings as str  # noqa: A001 — reference: `import dask_awkward.lib.str as str` (__init__.py:9)
from .operators.structure import (
    broadcast_arrays,
    copy,
    enforce_type,
    from_regular,
    to_packed,
    to_regular,
    with_name,
    with_parameter,
    without_parameters,
    argcartesian,
    argcombinations,
    argsort,
    cartesian,
    combinations,
    concatenate,
    drop_none,
    fill_none,
    firsts,
    flatten,
    full_like,
    is_none,
    isclose,
    local_index,
    mask,
    nan_to_num,
    num,
    ones_like,
    pad_none,
    ravel,
    run_lengths,
    singletons,
    sort,
    sort0,
    unflatten,
    unzip,
    values_astype,
    where,
    zeros_like,
    zip,
)
from .operators.reducers import (
    all,
    any,
    argmax,
    argmin,
    corr,
    count,
    count_nonzero,
    covar,
    linear_fit,
    max,
    mean,
    min,
    moment,
    prod,
    ptp,
    reduce_axis0_multi,
    softmax,
    std,
    sum,
    var,
)

__version__ = "0.1.0"
