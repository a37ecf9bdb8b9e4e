from .query import run_streaming_pipeline, stop_pipeline
from .sink import chunked_foreach_batch_writer

__all__ = ["chunked_foreach_batch_writer", "run_streaming_pipeline", "stop_pipeline"]
