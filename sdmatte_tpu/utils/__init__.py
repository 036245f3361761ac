from .observability import (  # noqa: F401
    get_logger, trace, timed, Metrics,
)
