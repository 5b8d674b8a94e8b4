from . import acoustic, decoder, encoder, layers  # noqa: F401
from .acoustic import Tacotron, compute_losses  # noqa: F401
