"""tpu-airband: a TPU-native wideband channelizer + voice demodulation framework.

Brand-new implementation (JAX/XLA/Pallas) with the capabilities of
RTLSDR-Airband (reference mounted at /root/reference): FFT channelization,
AM/NFM demodulation, squelch, CTCSS, filters, AGC, AFC, scan mode, mixers,
and streaming outputs — redesigned as batched, jitted, sharded TPU kernels.
"""

__version__ = "0.1.0"
