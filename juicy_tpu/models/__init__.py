"""Processor model family. Importing this package registers all processors."""

from juicy_tpu.models.base import ParamSpec, ProcessorDef, get_processor, registry

# Register every processor (order matches SURVEY.md §2.2 difficulty order).
import juicy_tpu.models.saturator  # noqa: F401
import juicy_tpu.models.infer      # noqa: F401
import juicy_tpu.models.width      # noqa: F401
import juicy_tpu.models.punch      # noqa: F401
import juicy_tpu.models.cohere     # noqa: F401
import juicy_tpu.models.motion     # noqa: F401
import juicy_tpu.models.texture    # noqa: F401

__all__ = ["ParamSpec", "ProcessorDef", "get_processor", "registry"]
