"""ctypes bindings for the native host runtime (native/*.cpp).

Auto-builds the shared libraries with g++ on first use (cached); callers
fall back to the pure-Python/scipy paths when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# pip-installed deployments (no repo checkout above the package) point this
# at a copy of native/*.cpp; unset, sources resolve inside the checkout, and
# when neither exists every native entry point degrades to its pure-Python
# fallback (same outputs, slower host path)
_NATIVE_DIR = os.environ.get("UCOD_NATIVE_SRC_DIR") or os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcclabel.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "cc_label.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_so(src: str, so: str, ldflags: Tuple[str, ...] = ()) -> bool:
    """Build to a private temp file then os.replace (atomic): metric-pool
    workers may all trigger the build concurrently, and a fixed -o target
    could be dlopen'd half-written or corrupted by interleaved writes."""
    tmp = f"{so}.build.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, src]
            + list(ldflags),
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load_so(src: str, so: str, ldflags: Tuple[str, ...] = ()) -> Optional[ctypes.CDLL]:
    """(Re)build when the source is newer, then dlopen; None on any failure."""
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        if not os.path.exists(src) or not _build_so(src, so, ldflags):
            return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib = _load_so(_SRC_PATH, _SO_PATH)
        if lib is None:
            return None
        lib.cc_label_u8.restype = ctypes.c_int32
        lib.cc_label_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.cc_stats.restype = None
        lib.cc_stats.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def cc_label(mask: np.ndarray) -> Optional[Tuple[int, np.ndarray]]:
    """Native 8-connectivity labeling; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mask_u8 = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    h, w = mask_u8.shape
    labels = np.empty((h, w), dtype=np.int32)
    n = lib.cc_label_u8(
        mask_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return int(n), labels


def cc_stats(labels: np.ndarray, num: int) -> Optional[np.ndarray]:
    """(num, 5) int32 [area, x0, y0, x1, y1] per component, native path."""
    lib = get_lib()
    if lib is None or num == 0:
        return None if lib is None else np.zeros((0, 5), np.int32)
    labels = np.ascontiguousarray(labels, dtype=np.int32)
    out = np.empty((num, 5), dtype=np.int32)
    lib.cc_stats(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.shape[0],
        labels.shape[1],
        num,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


# ---------------------------------------------------------------------------
# native metric scorer (native/metrics_kernel.cpp)
# ---------------------------------------------------------------------------

_METRICS_SO = os.path.join(_NATIVE_DIR, "libmetrics.so")
_METRICS_SRC = os.path.join(_NATIVE_DIR, "metrics_kernel.cpp")
_metrics_lib: Optional[ctypes.CDLL] = None
_metrics_tried = False


def get_metrics_lib() -> Optional[ctypes.CDLL]:
    global _metrics_lib, _metrics_tried
    with _lock:
        if _metrics_lib is not None or _metrics_tried:
            return _metrics_lib
        _metrics_tried = True
        lib = _load_so(_METRICS_SRC, _METRICS_SO)
        if lib is None:
            return None
        lib.score_one.restype = None
        lib.score_one.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # pred (normalised)
            ctypes.POINTER(ctypes.c_uint8),   # gt (bool)
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,                   # pred_is_int (protocol quirk)
            ctypes.POINTER(ctypes.c_double),  # 7x7 gaussian kernel
            ctypes.POINTER(ctypes.c_double),  # scalars[5]
            ctypes.POINTER(ctypes.c_double),  # e_curve[256]
            ctypes.POINTER(ctypes.c_double),  # f_curve[256]
        ]
        _metrics_lib = lib
        return _metrics_lib


def score_one_native(pred_norm: np.ndarray, gt_bool: np.ndarray, kernel7: np.ndarray):
    """Native per-image metric bundle on a protocol-normalised pair, or None
    when the library is unavailable.  Returns
    (sm, mae, wfm, acc, iou, e_curve, f_curve).

    ``pred_norm`` keeps normalize_pair's dtype: an integer array signals the
    constant-prediction quirk, where the reference's WFM convolution runs in
    integer arithmetic (scipy truncates the int64 output toward zero)."""
    lib = get_metrics_lib()
    if lib is None:
        return None
    pred_is_int = np.issubdtype(np.asarray(pred_norm).dtype, np.integer)
    pred = np.ascontiguousarray(pred_norm, dtype=np.float64)
    gt = np.ascontiguousarray(gt_bool, dtype=np.uint8)
    k = np.ascontiguousarray(kernel7, dtype=np.float64)
    h, w = pred.shape
    scalars = np.empty(5, np.float64)
    e_curve = np.empty(256, np.float64)
    f_curve = np.empty(256, np.float64)
    lib.score_one(
        pred.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        gt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, int(pred_is_int),
        k.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scalars.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        e_curve.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        f_curve.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return (
        float(scalars[0]), float(scalars[1]), float(scalars[2]),
        float(scalars[3]), float(scalars[4]), e_curve, f_curve,
    )


# ---------------------------------------------------------------------------
# native image pipeline (native/imagepipe.cpp): decode + PIL-exact bilinear
# resize + normalise, threaded over batches.  Disable with UCOD_NATIVE_IO=0.
# ---------------------------------------------------------------------------

_IMAGEPIPE_SO = os.path.join(_NATIVE_DIR, "libimagepipe.so")
_IMAGEPIPE_SRC = os.path.join(_NATIVE_DIR, "imagepipe.cpp")
_imagepipe_lib: Optional[ctypes.CDLL] = None
_imagepipe_tried = False


def get_imagepipe_lib() -> Optional[ctypes.CDLL]:
    global _imagepipe_lib, _imagepipe_tried
    with _lock:
        if _imagepipe_lib is not None or _imagepipe_tried:
            return _imagepipe_lib
        _imagepipe_tried = True
        if os.environ.get("UCOD_NATIVE_IO", "1") == "0":
            return None
        lib = _load_so(_IMAGEPIPE_SRC, _IMAGEPIPE_SO, ldflags=("-ljpeg", "-lpng"))
        if lib is None:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.ip_load_u8.restype = ctypes.c_int32
        lib.ip_load_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_void_p), i32p, i32p, i32p,
        ]
        lib.ip_resize_u8.restype = ctypes.c_int32
        lib.ip_resize_u8.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            u8p, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.ip_load_norm_batch.restype = ctypes.c_int32
        lib.ip_load_norm_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, f32p, f32p, f32p, ctypes.c_int32,
        ]
        lib.ip_free.restype = None
        lib.ip_free.argtypes = [ctypes.c_void_p]
        _imagepipe_lib = lib
        return _imagepipe_lib


_WANT_CH = {"L": 1, "RGB": 3}

_decode_parity: Optional[bool] = None


def _decode_parity_ok() -> bool:
    """One-time probe: the native JPEG/PNG decode must be byte-identical to
    Pillow ON THIS HOST.

    The resize is bit-exact BY CONSTRUCTION (it reimplements Pillow's
    resampling), but JPEG decode parity rests on the system libjpeg being
    compatible with the libjpeg-turbo Pillow bundles — an IJG libjpeg with a
    different IDCT/upsampling would differ by ±1/pixel and silently change
    features, caches and metrics between the native path and the PIL
    fallback (and between pod hosts).  The probe decodes noise + gradient
    images at 4:2:0 and 4:4:4 subsampling plus grayscale and palette/PNG
    variants through both stacks; ANY byte difference disables the native
    decode on this host (resize stays on), with a log line."""
    global _decode_parity
    if _decode_parity is not None:
        return _decode_parity
    import tempfile

    import numpy as np
    from PIL import Image

    ok = True
    try:
        rng = np.random.default_rng(1234)
        noise = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        grad = np.stack(
            list(
                np.meshgrid(
                    np.arange(31, dtype=np.uint8) * 8,
                    np.arange(29, dtype=np.uint8) * 8,
                    indexing="ij",
                )
            )
            + [np.full((31, 29), 128, np.uint8)],
            axis=-1,
        )
        with tempfile.TemporaryDirectory() as td:
            cases = []
            for name, arr, kw in (
                ("n75.jpg", noise, {"quality": 75}),   # 4:2:0 subsampling
                ("n95.jpg", noise, {"quality": 95}),   # 4:4:4
                ("g75.jpg", grad, {"quality": 75}),
                ("gray.jpg", noise[..., 0], {"quality": 85}),
                ("rgb.png", noise, {}),
                ("pal.png", None, {}),
            ):
                p = os.path.join(td, name)
                if name == "pal.png":
                    Image.fromarray(noise).convert(
                        "P", palette=Image.ADAPTIVE
                    ).save(p)
                else:
                    Image.fromarray(arr).save(p, **kw)
                cases.append(p)
            for p in cases:
                for mode in ("RGB", "L"):
                    with Image.open(p) as im:
                        pil = np.asarray(im.convert(mode))
                    nat = _load_image_u8_unchecked(p, mode)
                    if nat is None:
                        ok = False
                        break
                    if mode == "L":
                        nat = nat[..., 0]
                    if not np.array_equal(nat, pil):
                        ok = False
                        break
                if not ok:
                    break
    except Exception:
        ok = False
    if not ok:
        import logging

        logging.getLogger("ucod").warning(
            "native image DECODE disagrees with Pillow on this host (system "
            "libjpeg/libpng variant?) — native decode disabled, PIL decode + "
            "native resize in effect; outputs stay bit-identical to the PIL "
            "chain."
        )
    _decode_parity = ok
    return ok


def load_image_u8(path, mode: str = "RGB", size_hw: Optional[Tuple[int, int]] = None):
    """Decode (+convert, + optional PIL-exact BILINEAR resize) one image to a
    (H, W, C) uint8 array; None when the native path is unavailable, the
    host fails the decode-parity probe, or the container/colour-space is
    unsupported (caller falls back to PIL)."""
    if get_imagepipe_lib() is None or not _decode_parity_ok():
        return None
    return _load_image_u8_unchecked(path, mode, size_hw)


def _load_image_u8_unchecked(
    path, mode: str = "RGB", size_hw: Optional[Tuple[int, int]] = None
):
    lib = get_imagepipe_lib()
    if lib is None:
        return None
    dh, dw = size_hw if size_hw is not None else (0, 0)
    out = ctypes.c_void_p()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    rc = lib.ip_load_u8(
        str(path).encode(), _WANT_CH[mode], dh, dw,
        ctypes.byref(out), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
    )
    if rc != 0:
        return None
    try:
        n = h.value * w.value * c.value
        arr = np.ctypeslib.as_array(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), shape=(n,)
        ).reshape(h.value, w.value, c.value).copy()
    finally:
        lib.ip_free(out)
    return arr


def resize_u8_native(arr: np.ndarray, size_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """PIL.Image.BILINEAR-exact resize of an (H, W[, C]) uint8 array."""
    lib = get_imagepipe_lib()
    if lib is None:
        return None
    squeeze = arr.ndim == 2
    src = np.ascontiguousarray(arr[..., None] if squeeze else arr, dtype=np.uint8)
    sh, sw, c = src.shape
    dh, dw = size_hw
    dst = np.empty((dh, dw, c), dtype=np.uint8)
    rc = lib.ip_resize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw, c,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
    )
    if rc != 0:
        return None
    return dst[..., 0] if squeeze else dst


def load_norm_batch_native(
    paths,
    size_hw: Tuple[int, int],
    mean,
    std,
    mode: str = "RGB",
    nthreads: int = 0,
) -> Optional[np.ndarray]:
    """Threaded decode->resize->normalise of a batch of image files into a
    float32 (N, H, W, C) array, bit-identical to the PIL+numpy transform
    chain; None on unavailability, a failed decode-parity probe, or any
    per-image failure (PIL fallback)."""
    lib = get_imagepipe_lib()
    if lib is None or not paths or not _decode_parity_ok():
        return None
    want = _WANT_CH[mode]
    dh, dw = size_hw
    n = len(paths)
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 1)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    mean = np.ascontiguousarray(mean, dtype=np.float32)
    std = np.ascontiguousarray(std, dtype=np.float32)
    out = np.empty((n, dh, dw, want), dtype=np.float32)
    rc = lib.ip_load_norm_batch(
        c_paths, n, want, dh, dw,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads,
    )
    if rc != 0:
        return None
    return out
