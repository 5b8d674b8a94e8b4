from .pipeline import Synthesizer  # noqa: F401
