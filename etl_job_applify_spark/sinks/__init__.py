from .writers import write_csv, write_json, write_orc, write_parquet, write_jdbc, write_xml
from .upsert import upsert
from .versioned import (
    CommitConflict,
    clone_table,
    fsck_table,
    restore_table,
    commit_version,
    list_versions,
    optimize_table,
    read_table,
    snapshot_files,
    table_history,
    vacuum_table,
    version_as_of,
    write_version,
)
from .merge import merge_into
from .bloom import build_blooms, prune_files_bloom
from .properties import get_table_properties, set_table_properties, update_table_properties
from .changes import (
    commit_cursor,
    consume_changes,
    schema_changes,
    sync_changes_to_jdbc,
    table_changes,
)
from .backends import (
    DEFAULT_BACKEND,
    DeltaBackend,
    MergeBackend,
    VersionedParquetBackend,
    delta_available,
)
from .redshift import (
    copy_statements,
    execute_statement,
    execute_transaction,
    publish_statements,
    write_jdbc_transactional,
    write_redshift,
)

__all__ = ["write_csv", "write_json", "write_orc", "write_parquet", "write_jdbc", "write_xml", "upsert",
           "write_version", "read_table", "list_versions", "snapshot_files",
           "optimize_table", "vacuum_table", "table_history", "version_as_of",
           "CommitConflict", "commit_version", "merge_into", "table_changes", "consume_changes", "commit_cursor", "schema_changes", "sync_changes_to_jdbc",
           "MergeBackend", "VersionedParquetBackend", "DeltaBackend", "delta_available", "DEFAULT_BACKEND",
           "copy_statements", "execute_statement", "write_redshift",
           "execute_transaction", "publish_statements", "write_jdbc_transactional",
           "build_blooms", "prune_files_bloom", "clone_table",
           "get_table_properties", "set_table_properties", "update_table_properties",
           "fsck_table", "restore_table"]
