from .catalog import Catalog
from .table import (
    ConcurrentCommitError,
    LakehouseTable,
    Snapshot,
)

__all__ = ["Catalog", "LakehouseTable", "Snapshot", "ConcurrentCommitError"]
