"""Host data layer: keys, waveform IO, fetchers, synthetic data."""
from detex_tpu.data import keys, waveio
from detex_tpu.data.keys import readKey

__all__ = ["keys", "waveio", "readKey"]
