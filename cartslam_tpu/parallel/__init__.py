from .multiseq import make_batched_step  # noqa: F401
from .system import MultiSeqSystem  # noqa: F401
