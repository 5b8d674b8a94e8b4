"""TPU-native Mandarin TTS framework (TransTacoS acoustic model + RetuneGAN
vocoder capabilities, rebuilt on JAX/XLA/Pallas/pjit).

Subpackages:
  config    -- unified frozen-dataclass configuration
  audio     -- jittable DSP (dsp), host feature extraction (features), mel
  text      -- pinyin phonology, syl4 G2P, symbol tables, serving frontend
  models    -- acoustic model, vocoder generators/discriminators, losses
  ops       -- Pallas TPU kernels for hot paths
  data      -- corpus preprocessing + train-time feeders
  parallel  -- device mesh + sharding helpers
  train     -- train loops, schedules, checkpointing
  serve     -- jitted text->wav pipeline + HTTP endpoints
"""

from .config import AcousticConfig, AudioConfig, Config, VocoderConfig  # noqa: F401

__version__ = '0.1.0'
