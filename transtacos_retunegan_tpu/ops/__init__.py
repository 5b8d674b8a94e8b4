from . import fused_decoder, lsa_kernel  # noqa: F401
