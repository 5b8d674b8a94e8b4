from . import dsp, features, mel  # noqa: F401
