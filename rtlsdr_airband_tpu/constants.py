"""Framework-wide constants.

These mirror the reference design constants of RTLSDR-Airband
(reference: src/rtl_airband.h:64-97) so that the TPU pipeline produces the
same audio cadence and block structure, but they are *parameters* here, not
compile-time macros: the NFM-capable build is always on, and the audio rate
is selected per pipeline instance.
"""

from __future__ import annotations

# Default SDR sample rate (samples/sec, complex IQ). reference: rtl_airband.h:64-65
DEFAULT_SAMPLE_RATE = 2_560_000
MIN_BUF_SIZE = 2_560_000

# Output audio sample rate. The reference uses 8000 Hz, or 16000 Hz when
# compiled with NFM support (reference: rtl_airband.h:67-71). We support both
# at runtime; a pipeline with any NFM channel should use 16000.
WAVE_RATE_AM = 8000
WAVE_RATE_NFM = 16000

# Audio samples per processing block (125 ms at 8 kHz).
# reference: rtl_airband.h:73 (WAVE_BATCH = WAVE_RATE / 8)
def wave_batch(wave_rate: int) -> int:
    return wave_rate // 8

# Look-back / look-ahead margin for AGC and squelch (samples).
# reference: rtl_airband.h:75 (AGC_EXTRA = 100)
AGC_EXTRA = 100

# FFT size limits. reference: rtl_airband.h:80-82
MIN_FFT_SIZE_LOG = 8
DEFAULT_FFT_SIZE_LOG = 9
MAX_FFT_SIZE_LOG = 13
DEFAULT_FFT_SIZE = 1 << DEFAULT_FFT_SIZE_LOG

# Squelch pre/post comparison delay-line length.
# reference: squelch.cpp:67 (specific to the 2nd order Bessel lowpass filter)
SQUELCH_BUFFER_SIZE = 102

# Squelch timing (samples). reference: squelch.cpp:49-51
SQUELCH_OPEN_DELAY = 197
SQUELCH_CLOSE_DELAY = 197
SQUELCH_LOW_SIGNAL_ABORT = 88

# Flap detection. reference: squelch.cpp:62-64
SQUELCH_RECENT_SAMPLE_SIZE = 1000
SQUELCH_FLAP_OPENS_THRESHOLD = 3

# Default squelch SNR threshold in dB. reference: squelch.cpp:38
DEFAULT_SQUELCH_SNR_DB = 9.54

# Mixer output cadence divisor. reference: rtl_airband.h:96 (MIX_DIVISOR = 2)
MIX_DIVISOR = 2

# Default NFM de-emphasis time constant tau (seconds). reference: rtl_airband.cpp:87
DEFAULT_NFM_TAU = 2e-4

# Fixed-point phase accumulator modulus for the derotator:
# phases live in [0, 2^24) mapped onto [0, 2*pi).
# reference: rtl_airband.cpp:515-516, util.cpp:112-127
PHASE_BITS = 24
PHASE_MOD = 1 << PHASE_BITS
