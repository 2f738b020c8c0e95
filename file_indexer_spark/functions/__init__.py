from file_indexer_spark.functions.files_fns import extension_expr, size_band_expr, size_band_order_expr

__all__ = ["extension_expr", "size_band_expr", "size_band_order_expr"]
