from .logging import ValueWindow, get_logger, timer  # noqa: F401
