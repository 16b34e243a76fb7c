from .kv_sink import bounded_async_foreach_writer, create_only_append, dry_run

__all__ = ["bounded_async_foreach_writer", "create_only_append", "dry_run"]
