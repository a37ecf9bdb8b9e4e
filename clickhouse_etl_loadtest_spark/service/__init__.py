"""Pipeline control-plane service + client (reference remote-API parity,
/root/reference/src/utils/pipeline.py)."""

from .client import PipelineServiceClient
from .errors import (
    InvalidPipelineConfigError,
    PipelineAlreadyExistsError,
    PipelineNotFoundError,
    PipelineServiceError,
    ServiceConnectionError,
)
from .server import PipelineService

__all__ = [
    "PipelineService",
    "PipelineServiceClient",
    "PipelineServiceError",
    "PipelineNotFoundError",
    "PipelineAlreadyExistsError",
    "ServiceConnectionError",
    "InvalidPipelineConfigError",
]
