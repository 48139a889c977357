from .validate import validate_stream, validate_stream_foreach_batch  # noqa: F401
