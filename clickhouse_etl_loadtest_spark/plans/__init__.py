from .compiler import compile_batch, decode_topic

__all__ = ["compile_batch", "decode_topic"]
