from file_indexer_spark.indexer.scan import scan_directory
from file_indexer_spark.indexer.checksum import add_checksums, checksum_eligible_expr
from file_indexer_spark.indexer.files_table import FilesTable
from file_indexer_spark.indexer.two_phase import IndexStats, two_phase_index, update_index
from file_indexer_spark.indexer.cleanup import cleanup_deleted_files, cleanup_empty_directories

__all__ = [
    "scan_directory",
    "add_checksums",
    "checksum_eligible_expr",
    "FilesTable",
    "IndexStats",
    "two_phase_index",
    "update_index",
    "cleanup_deleted_files",
    "cleanup_empty_directories",
]
