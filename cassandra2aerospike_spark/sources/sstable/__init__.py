from .datasource import SCHEMA, SSTableRunDataSource, register
from .format import (
    Cell,
    Partition,
    RunReader,
    RunWriter,
    discover_runs,
    token_of,
)

__all__ = [
    "SCHEMA",
    "SSTableRunDataSource",
    "register",
    "Cell",
    "Partition",
    "RunReader",
    "RunWriter",
    "discover_runs",
    "token_of",
]
