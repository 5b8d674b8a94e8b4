from . import frontend, g2p, phonology, symbols  # noqa: F401
from .g2p import from_syl4, text_to_phoneme, to_syl4  # noqa: F401
from .phonology import phonodict  # noqa: F401
from .symbols import get_table, get_vocab_size  # noqa: F401
