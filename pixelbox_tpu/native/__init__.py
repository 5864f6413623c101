"""Native (C++) runtime components, loaded via ctypes.

Build-on-first-use: sources in this directory compile to a shared library
next to the package (or $PIXELBOX_TPU_NATIVE_DIR) with g++ -O3.  Every
native entry point has a pure-Python fallback so the framework degrades
gracefully where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False

_SOURCES = ["qoi.cpp", "cpu_scan.cpp"]
# Decode support links system image codecs; built separately so a host
# without libjpeg/libpng/libwebp still gets the core native library.
_DECODE_SOURCE = "image_decode.cpp"
_DECODE_LIBS = ["-ljpeg", "-lpng16", "-lwebp"]
_SO_NAME = "libpixelbox_native.so"


def _build_dir() -> Path:
    d = os.environ.get("PIXELBOX_TPU_NATIVE_DIR")
    return Path(d) if d else _HERE


def _newest_mtime(paths) -> float:
    return max(p.stat().st_mtime for p in paths)


def load_native():
    """Build (if stale) and load the native library; None if unavailable."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            srcs = [_HERE / s for s in _SOURCES if (_HERE / s).exists()]
            if not srcs:
                raise FileNotFoundError("no native sources present")
            decode_src = _HERE / _DECODE_SOURCE
            all_srcs = srcs + ([decode_src] if decode_src.exists() else [])
            so = _build_dir() / _SO_NAME
            if not so.exists() or so.stat().st_mtime < _newest_mtime(all_srcs):
                base = [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-std=c++17", "-pthread",
                ]
                try:
                    subprocess.run(
                        base + [str(s) for s in all_srcs]
                        + _DECODE_LIBS + ["-o", str(so)],
                        check=True, capture_output=True, timeout=240,
                    )
                except Exception:
                    # No image codec libs/headers on this host: build the
                    # core library without native decode.
                    subprocess.run(
                        base + [str(s) for s in srcs] + ["-o", str(so)],
                        check=True, capture_output=True, timeout=240,
                    )
            lib = ctypes.CDLL(str(so))
            _configure_signatures(lib)
            _LIB = lib
        except Exception as e:  # toolchain missing, build error, load error
            print(f"pixelbox_tpu: native library unavailable ({e}); "
                  "using Python fallbacks", file=sys.stderr)
            _LIB_FAILED = True
        return _LIB


def _configure_signatures(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.qoi_encode_bound.restype = ctypes.c_size_t
    lib.qoi_encode_bound.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
    lib.qoi_encode.restype = ctypes.c_size_t
    lib.qoi_encode.argtypes = [
        u8p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        u8p, ctypes.c_size_t,
    ]
    lib.qoi_decode_header.restype = ctypes.c_int
    lib.qoi_decode_header.argtypes = [u8p, ctypes.c_size_t, u32p, u32p, u32p]
    lib.qoi_decode.restype = ctypes.c_size_t
    lib.qoi_decode.argtypes = [
        u8p, ctypes.c_size_t, u8p, ctypes.c_size_t, ctypes.c_uint32,
    ]
    if hasattr(lib, "px_decode_rgb"):
        lib.px_sniff.restype = ctypes.c_int
        lib.px_sniff.argtypes = [u8p, ctypes.c_size_t]
        lib.px_decode_header.restype = ctypes.c_int
        lib.px_decode_header.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_int, u32p, u32p, u32p, u32p,
        ]
        lib.px_decode_rgb.restype = ctypes.c_int
        lib.px_decode_rgb.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_int, u8p, ctypes.c_size_t,
            u32p, u32p,
        ]
        lib.px_resize.restype = None
        lib.px_resize.argtypes = [
            u8p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            u8p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,
        ]
    if hasattr(lib, "cpu_cosine_scan_topk"):
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.cpu_cosine_scan_topk.restype = None
        lib.cpu_cosine_scan_topk.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64,  # db, n, d
            u8p, ctypes.c_int64,                  # queries, q
            ctypes.c_int32, ctypes.c_float,       # k, max_distance
            ctypes.c_int32,                       # n_threads
            f32p, i32p,                           # out dist, out idx
        ]
