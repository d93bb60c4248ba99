from cuckoo_filter_spark.core.cuckoo import CuckooFilter

__all__ = ["CuckooFilter"]
