"""Out-of-tree build of the ACTUAL reference rtl_airband binary.

Compiles the unmodified reference sources (reference: src/CMakeLists.txt:284-300
object list) against shim headers/implementations for the four dev packages
missing from this image:
  - fftw3f      -> real radix-2 FFT shim (include/fftw3.h, src/shim_fftw.cpp)
  - libconfig++ -> minimal working parser (include/libconfig.h++, src/shim_libconfig.cpp)
  - lame        -> real libmp3lame.so.0 with hand-written public-ABI header
  - shout       -> inert stubs (icecast never configured in golden runs)

No reference source file is modified or copied; they are compiled in place.
Build flags mirror the reference CMake Release config: -O3 -ffast-math
(reference: src/CMakeLists.txt:18-21), NFM on (WAVE_RATE=16000).
The binary is cached under tests/golden/refbuild/build/ keyed on shim mtimes.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF_SRC = os.environ.get("RTLSDR_AIRBAND_REF", "/root/reference") + "/src"
BUILD_DIR = os.path.join(HERE, "build")
BINARY = os.path.join(BUILD_DIR, "rtl_airband")

# reference: src/CMakeLists.txt:284-300 (rtl_airband_base sources, minus
# version.cpp which we supply)
REF_SOURCES = [
    "config.cpp",
    "input-common.cpp",
    "input-file.cpp",
    "input-helpers.cpp",
    "mixer.cpp",
    "output.cpp",
    "rtl_airband.cpp",
    "squelch.cpp",
    "ctcss.cpp",
    "util.cpp",
    "udp_stream.cpp",
    "logging.cpp",
    "filters.cpp",
    "helper_functions.cpp",
]
SHIM_SOURCES = ["shim_fftw.cpp", "shim_libconfig.cpp", "version.cpp"]

CXXFLAGS = [
    "-std=c++11",
    "-O3",
    "-ffast-math",
    "-pthread",
    "-D_FILE_OFFSET_BITS=64",
    "-D_POSIX_C_SOURCE=200112L",
    "-D_GNU_SOURCE",
    "-DNDEBUG",
    "-w",  # reference uses -Wall -Werror against its own deps; not our fight
    "-I" + os.path.join(HERE, "include"),
    "-I" + REF_SRC,
]
LDFLAGS = ["-rdynamic", "-ldl", "-lm", "-lpthread", "-l:libmp3lame.so.0"]


def _mtimes() -> float:
    latest = 0.0
    for root in (os.path.join(HERE, "include"), os.path.join(HERE, "src"), __file__):
        if os.path.isfile(root):
            latest = max(latest, os.path.getmtime(root))
            continue
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                latest = max(latest, os.path.getmtime(os.path.join(dirpath, f)))
    return latest


def available() -> bool:
    return os.path.isdir(REF_SRC) and os.path.exists(os.path.join(REF_SRC, "rtl_airband.cpp"))


def build(verbose: bool = False) -> str:
    """Build (or reuse a cached) reference binary; returns its path."""
    if not available():
        raise RuntimeError(f"reference sources not found at {REF_SRC}")
    stamp = os.path.join(BUILD_DIR, ".stamp")
    if os.path.exists(BINARY) and os.path.exists(stamp) and os.path.getmtime(stamp) >= _mtimes():
        return BINARY
    os.makedirs(BUILD_DIR, exist_ok=True)
    srcs = [os.path.join(REF_SRC, s) for s in REF_SOURCES] + [os.path.join(HERE, "src", s) for s in SHIM_SOURCES]
    cmd = ["g++"] + CXXFLAGS + srcs + ["-o", BINARY] + LDFLAGS
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(f"reference build failed:\n{proc.stderr[-8000:]}")
    with open(stamp, "w") as f:
        f.write("ok\n")
    return BINARY


if __name__ == "__main__":
    print(build(verbose=True))
