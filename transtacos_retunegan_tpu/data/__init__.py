from . import feeder, preprocess, vocoder_data  # noqa: F401
