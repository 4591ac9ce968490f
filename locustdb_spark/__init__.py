"""locustdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cswinter/LocustDB (reference surveyed in
SURVEY.md), plus large-scale training-data pipeline operators."""

from .engine import LocustDB
from .session import get_spark
from .versioned import (CommitStore, ConditionalPutCommitStore,
                        PosixCommitStore, VersionedTable)

__all__ = ["CommitStore", "ConditionalPutCommitStore", "LocustDB",
           "PosixCommitStore", "VersionedTable", "get_spark"]
__version__ = "0.1.0"
