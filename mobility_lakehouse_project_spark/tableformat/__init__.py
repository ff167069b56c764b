from .table import (
    ConcurrentCommitError,
    LakehouseTable,
    Snapshot,
)

__all__ = ["LakehouseTable", "Snapshot", "ConcurrentCommitError"]
