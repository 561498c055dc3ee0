from .audit_sink import AuditSinkDataSource
from .batch import load_table, table_path
from .pydatasource import EventGenDataSource

__all__ = [
    "AuditSinkDataSource",
    "EventGenDataSource",
    "load_table",
    "table_path",
]
