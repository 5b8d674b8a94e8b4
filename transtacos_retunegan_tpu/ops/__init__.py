from . import lsa_kernel  # noqa: F401
