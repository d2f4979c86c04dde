"""Thread-safe first-use g++ builds for the ctypes-bound native libs.

The preprocess CLI runs panos on a thread pool and both native engines
(lsd, merge) lazily build on first call: without serialization two
threads can race g++ onto the same output path while a third CDLLs the
half-written file. One process-wide lock covers check+build+dlopen, and
the compile lands in a temp file published with os.replace (atomic on
POSIX) so no reader can ever observe a partial .so.
"""

import ctypes
import os
import subprocess
import tempfile
import threading

_BUILD_LOCK = threading.Lock()


def build_and_load(src: str, lib_path: str, extra_flags=()) -> ctypes.CDLL:
    """Compile ``src`` to ``lib_path`` if stale and dlopen it.

    Serialized process-wide; the .so is written to a temp file in the
    same directory and atomically renamed into place, so concurrent
    first-use from many threads (or even processes sharing the checkout)
    sees either the old complete library or the new complete one.
    """
    with _BUILD_LOCK:
        if (not os.path.isfile(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            fd, tmp = tempfile.mkstemp(
                suffix=".so", dir=os.path.dirname(lib_path))
            os.close(fd)
            try:
                subprocess.run(
                    ["g++", "-O3", *extra_flags, "-shared", "-fPIC",
                     "-o", tmp, src],
                    check=True, capture_output=True)
                os.replace(tmp, lib_path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        return ctypes.CDLL(lib_path)
