from .env import env_flag  # noqa: F401
from .observability import (  # noqa: F401
    get_logger, trace, timed, Metrics,
)
