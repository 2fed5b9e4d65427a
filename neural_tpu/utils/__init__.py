from .audio import read_wav, load_audio_16k
from .profiling import Timings, maybe_trace, verbosity

__all__ = ["read_wav", "load_audio_16k", "Timings", "maybe_trace",
           "verbosity"]
