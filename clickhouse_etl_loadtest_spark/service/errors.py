"""Typed client errors mirroring the reference SDK's error surface
(/root/reference/src/utils/pipeline.py:27-67 catches
``errors.PipelineNotFoundError`` / ``errors.PipelineAlreadyExistsError`` /
``errors.ConnectionError`` from the glassflow SDK)."""

from __future__ import annotations


class PipelineServiceError(Exception):
    """Base class for pipeline-service client failures."""


class PipelineNotFoundError(PipelineServiceError):
    """No pipeline is currently running on the service."""


class PipelineAlreadyExistsError(PipelineServiceError):
    """A pipeline is already running; the service runs one at a time."""


class ServiceConnectionError(PipelineServiceError):
    """The service host is unreachable (reference: errors.ConnectionError)."""


class InvalidPipelineConfigError(PipelineServiceError):
    """The posted pipeline config failed validation (HTTP 422)."""
