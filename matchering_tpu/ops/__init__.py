"""TPU-native DSP kernel library (JAX/XLA).

Covers the reference's kernel layer (``matchering/dsp.py``) plus all the
native compute it inherits from scipy/statsmodels/resampy (SURVEY.md §2.2):
FFT spectrum averaging, overlap-save convolution, sliding maxima, IIR scans,
LOWESS smoothing, cubic-grid resampling operators and polyphase sample-rate
conversion.
"""

from . import (
    basics,
    blocks,
    convolve,
    fftpack,
    fir,
    iir,
    lowess,
    resample,
    sliding,
    smoothing,
    spectrum,
)

__all__ = [
    "basics",
    "blocks",
    "fftpack",
    "convolve",
    "fir",
    "iir",
    "lowess",
    "resample",
    "sliding",
    "smoothing",
    "spectrum",
]
