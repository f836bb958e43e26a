from .registry import build_system, read_system_config  # noqa: F401
