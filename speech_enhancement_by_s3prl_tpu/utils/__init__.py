from .config import remove_self, update_args  # noqa: F401
from .plotting import plot_spectrogram, plot_spectrograms  # noqa: F401
from .signal import Resampler, remove_silence  # noqa: F401
