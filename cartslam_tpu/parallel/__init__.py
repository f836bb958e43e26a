from .multiseq import make_batched_step  # noqa: F401
