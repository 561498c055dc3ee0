from .replay import chunk_events, read_event_stream, run_to_memory
from . import jobs
from . import temporal
from . import vector_index

__all__ = ["chunk_events", "read_event_stream", "run_to_memory", "jobs", "temporal", "vector_index"]
