from .module import Dependency, Module, HostModule, PipelineContext, StepContext  # noqa: F401
from .pipeline import Pipeline  # noqa: F401
from .system import System  # noqa: F401
