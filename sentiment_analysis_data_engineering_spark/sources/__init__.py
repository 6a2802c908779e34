from .io import append, idempotent_append, replace_partition, scan

__all__ = ["scan", "append", "idempotent_append", "replace_partition"]
