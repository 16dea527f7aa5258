# rtlsdr-airband-tpu container image (deployment parity with the
# reference's Dockerfile, rebuilt for the Python/JAX stack).
#
# Build:  docker build -t rtl-airband-tpu .
# Run:    docker run --rm -v /path/to/rtl_airband.conf:/etc/rtl_airband.conf \
#             rtl-airband-tpu -F -e -c /etc/rtl_airband.conf
#
# The base image selects the accelerator stack: plain `jax[cpu]` here; on a
# Cloud TPU VM swap the pip line for `jax[tpu]` (libtpu comes with the VM).
# Host-side sinks use ctypes bindings, so the runtime stage installs the
# same shared libraries the reference links: libmp3lame (MP3 encode),
# librtlsdr/libmirisdr/libsoapysdr (SDR ingest), libpulse (audio monitor).

FROM python:3.12-slim-bookworm AS build

RUN apt-get update && apt-get install -y --no-install-recommends \
      build-essential \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /src
COPY pyproject.toml README.md ./
COPY rtlsdr_airband_tpu ./rtlsdr_airband_tpu
COPY native ./native
RUN pip wheel --no-deps -w /wheels . \
    && make -C native \
    && mkdir -p /out && cp native/*.so /out/ 2>/dev/null || true

FROM python:3.12-slim-bookworm

RUN apt-get update && apt-get install -y --no-install-recommends \
      libmp3lame0 \
      librtlsdr0 \
      libsoapysdr0.8 \
      libpulse0 \
    && rm -rf /var/lib/apt/lists/*

COPY --from=build /wheels /wheels
RUN pip install --no-cache-dir "jax[cpu]" /wheels/*.whl && rm -rf /wheels
# native ingest helpers (ring buffer / sample converters); the package
# degrades gracefully to its pure-python paths if absent
COPY --from=build /out/ /usr/local/lib/rtlsdr_airband_tpu/
ENV RTLSDR_AIRBAND_NATIVE_DIR=/usr/local/lib/rtlsdr_airband_tpu

ENTRYPOINT ["rtl-airband-tpu"]
CMD ["-F", "-e", "-c", "/etc/rtl_airband.conf"]
