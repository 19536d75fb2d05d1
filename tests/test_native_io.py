"""Native image pipeline (native/imagepipe.cpp): bit-exact parity vs PIL.

The contract is strict: the native decode/resize/normalise chain must produce
byte-identical uint8 arrays and bit-identical float32 arrays vs the
PIL+numpy fallback, so that toggling ``UCOD_NATIVE_IO`` can never change any
computed feature, metric, or checkpoint (reference host pipeline:
``data/datasets/transforms.py:8-43``, ``base_dataset.py:124-144``)."""

import os

import numpy as np
import pytest
from PIL import Image

from ucod_dpl_tpu.data import transforms as T
from ucod_dpl_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_imagepipe_lib()
    if lib is None:
        pytest.skip("native image pipeline unavailable (no g++/libjpeg/libpng?)")
    return lib


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    """One file per supported container/colour-space combination."""
    td = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (211, 317, 3), dtype=np.uint8)
    rgba = np.concatenate(
        [a, rng.integers(0, 256, (211, 317, 1), dtype=np.uint8)], axis=-1
    )
    files = {}

    def save(img, name, **kw):
        p = td / name
        img.save(p, **kw)
        files[name] = p

    save(Image.fromarray(a), "rgb.jpg", quality=92)
    save(Image.fromarray(a).convert("L"), "gray.jpg", quality=92)
    save(Image.fromarray(a), "rgb.png")
    save(Image.fromarray(a).convert("L"), "gray.png")
    save(Image.fromarray(a).convert("P", palette=Image.ADAPTIVE), "palette.png")
    save(Image.fromarray(rgba, "RGBA"), "rgba.png")
    save(Image.fromarray(a).convert("1"), "onebit.png")
    return files


RESIZE_CASES = [
    ((515, 723), (518, 518), 3),  # mixed up/down (the 518px eval geometry)
    ((300, 200), (756, 756), 3),  # upscale (CORAL high-res transform)
    ((64, 64), (37, 91), 3),  # downscale to odd sizes
    ((518, 518), (518, 518), 3),  # same-size short-circuit
    ((333, 777), (296, 296), 1),  # grayscale (labels)
    ((100, 50), (200, 400), 1),
    ((1, 1), (8, 8), 3),  # degenerate source
]


@pytest.mark.parametrize("src_hw,dst_hw,ch", RESIZE_CASES)
def test_resize_bit_exact_vs_pillow(lib, src_hw, dst_hw, ch):
    rng = np.random.default_rng(hash((src_hw, dst_hw, ch)) % 2**32)
    shape = src_hw if ch == 1 else (*src_hw, ch)
    arr = rng.integers(0, 256, shape, dtype=np.uint8)
    pil = np.asarray(
        Image.fromarray(arr).resize((dst_hw[1], dst_hw[0]), Image.BILINEAR)
    )
    nat = native.resize_u8_native(arr, dst_hw)
    assert nat is not None
    np.testing.assert_array_equal(nat, pil)


@pytest.mark.parametrize("mode", ["P", "1"])
def test_resize_palette_and_bilevel_stay_on_pil_path(lib, mode):
    """Pillow resamples P/1 images with NEAREST whatever filter is asked;
    interpolating palette indices / booleans natively would be wrong, so
    resize_bilinear must route those modes through PIL."""
    rng = np.random.default_rng(11)
    img = Image.fromarray(rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)).convert(
        mode, **({"palette": Image.ADAPTIVE} if mode == "P" else {})
    )
    got = T.resize_bilinear(img, (23, 31))
    want = np.asarray(img.resize((31, 23), Image.BILINEAR))
    np.testing.assert_array_equal(got, want)


def test_batch_many_failures_terminates(lib, tmp_path):
    """Several corrupt files across threads must report failure promptly (the
    min-index CAS in ip_load_norm_batch must not livelock when failures land
    out of order)."""
    paths = []
    for i in range(16):
        p = tmp_path / f"f{i}.jpg"
        if i == 5:
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p, quality=90)
        else:
            p.write_bytes(b"\xff\xd8not a real jpeg" + bytes([i]))
        paths.append(p)
    out = native.load_norm_batch_native(
        paths, (16, 16), T.IMAGENET_MEAN, T.IMAGENET_STD, nthreads=8
    )
    assert out is None


@pytest.mark.parametrize("mode", ["RGB", "L"])
def test_decode_bit_exact_vs_pillow(lib, image_files, mode):
    for name, path in image_files.items():
        with Image.open(path) as im:
            pil = np.asarray(im.convert(mode))
        nat = native.load_image_u8(path, mode)
        assert nat is not None, f"{name} should be native-decodable"
        if mode == "L":
            nat = nat[..., 0]
        np.testing.assert_array_equal(nat, pil, err_msg=f"{mode} {name}")


def test_decode_with_fused_resize(lib, image_files):
    path = image_files["rgb.jpg"]
    with Image.open(path) as im:
        pil = np.asarray(im.convert("RGB").resize((96, 64), Image.BILINEAR))
    nat = native.load_image_u8(path, "RGB", size_hw=(64, 96))
    np.testing.assert_array_equal(nat, pil)


def test_unsupported_container_returns_none(lib, tmp_path):
    p = tmp_path / "img.bmp"  # BMP is deliberately outside the native contract
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    assert native.load_image_u8(p, "RGB") is None
    assert native.load_image_u8(tmp_path / "missing.jpg", "RGB") is None


# ---------------------------------------------------------------------------
# transform-layer loaders: native path vs forced-PIL path, bit-identical
# ---------------------------------------------------------------------------


def _pil_reference_image(path, size_hw):
    with Image.open(path) as im:
        im = im.convert("RGB")
        if size_hw is not None:
            im = im.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
        arr = np.asarray(im, np.float32) / 255.0
    return (arr - T.IMAGENET_MEAN) / T.IMAGENET_STD


def test_load_image_transform_matches_pil_chain(lib, image_files):
    for name, path in image_files.items():
        got = T.load_image_transform(path, (96, 128))
        want = _pil_reference_image(path, (96, 128))
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, want.astype(np.float32), err_msg=name)


def test_load_image_batch_transform_matches_pil_chain(lib, image_files):
    paths = sorted(image_files.values())
    got = T.load_image_batch_transform(paths, (64, 96))
    want = np.stack([_pil_reference_image(p, (64, 96)) for p in paths]).astype(
        np.float32
    )
    assert got.shape == (len(paths), 64, 96, 3) and got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_batch_falls_back_per_image_on_unsupported(lib, tmp_path):
    """A BMP in the batch must not poison it — the loader falls back to the
    per-image PIL path for the whole batch and still returns exact output."""
    rng = np.random.default_rng(3)
    paths = []
    for i, ext in enumerate(["jpg", "bmp", "png"]):
        a = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
        p = tmp_path / f"im{i}.{ext}"
        Image.fromarray(a).save(p)
        paths.append(p)
    got = T.load_image_batch_transform(paths, (32, 32))
    want = np.stack([_pil_reference_image(p, (32, 32)) for p in paths]).astype(
        np.float32
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("keep_size", [False, True])
def test_load_label_transform_matches_pil_chain(lib, image_files, keep_size):
    path = image_files["gray.png"]
    with Image.open(path) as im:
        im = im.convert("L")
        if not keep_size:
            im = im.resize((96, 64), Image.BILINEAR)
        want = (np.asarray(im, np.float32) / 255.0)[..., None]
    got = T.load_label_transform(path, (64, 96), keep_size=keep_size)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_loaders_exact_without_native(monkeypatch, image_files):
    """With the native pipeline gated off, the loaders still return the same
    bytes through PIL (UCOD_NATIVE_IO=0 equivalence)."""
    monkeypatch.setattr(native, "load_image_u8", lambda *a, **k: None)
    monkeypatch.setattr(native, "load_norm_batch_native", lambda *a, **k: None)
    monkeypatch.setattr(native, "resize_u8_native", lambda *a, **k: None)
    paths = sorted(image_files.values())
    got1 = T.load_image_transform(paths[0], (48, 48))
    gotb = T.load_image_batch_transform(paths, (48, 48))
    want = np.stack([_pil_reference_image(p, (48, 48)) for p in paths]).astype(
        np.float32
    )
    np.testing.assert_array_equal(got1, want[0])
    np.testing.assert_array_equal(gotb, want)


def test_grid_patch_arrays_match_reference_crop_loop(lib, image_files):
    """LRDataset._grid_patch_arrays (one resize + vectorised normalise +
    slicing) vs the reference's per-patch crop->transform loop
    (lr_dataset.py geometry)."""
    from ucod_dpl_tpu.data.dataset import LRDataset

    path = image_files["rgb.jpg"]
    ds = object.__new__(LRDataset)  # geometry-only: no config needed
    ds.image_size = (37, 41)
    ds.window_size = 3
    with Image.open(path) as img:
        img = img.convert("RGB")
        got = LRDataset._grid_patch_arrays(ds, img)
        gh, gw = ds.image_size
        big = img.resize((3 * gw, 3 * gh), Image.BILINEAR)
        want = np.stack(
            [
                T.patch_transform(big.crop((j * gw, i * gh, (j + 1) * gw, (i + 1) * gh)))
                for i in range(3)
                for j in range(3)
            ]
        )
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_decoder_survives_corrupt_inputs(lib, tmp_path):
    """Truncated/corrupted/mislabeled containers must come back as error
    codes (None), never crash the process — a segfault in the decoder would
    take down a whole training run.  Exercises the libjpeg setjmp error
    path, the libpng error path, and the container sniffing."""
    rng = np.random.default_rng(5)
    real = tmp_path / "real.jpg"
    Image.fromarray(rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)).save(
        real, quality=90
    )
    jpeg_bytes = real.read_bytes()
    png = tmp_path / "real.png"
    Image.fromarray(rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)).save(png)
    png_bytes = png.read_bytes()

    cases = {
        "empty": b"",
        "one_byte": b"\xff",
        "jpeg_magic_only": b"\xff\xd8",
        "jpeg_truncated_header": jpeg_bytes[:20],
        "jpeg_truncated_body": jpeg_bytes[: len(jpeg_bytes) // 2],
        "jpeg_corrupt_body": jpeg_bytes[:40]
        + bytes(rng.integers(0, 256, 200, dtype=np.uint8).tolist())
        + jpeg_bytes[240:],
        "png_magic_only": png_bytes[:8],
        "png_truncated": png_bytes[: len(png_bytes) // 2],
        "png_corrupt_chunks": png_bytes[:16]
        + bytes(rng.integers(0, 256, 64, dtype=np.uint8).tolist()),
        "random_garbage": bytes(rng.integers(0, 256, 512, dtype=np.uint8).tolist()),
    }
    for name, payload in cases.items():
        p = tmp_path / f"{name}.bin"
        p.write_bytes(payload)
        for mode in ("RGB", "L"):
            for size in (None, (16, 16)):
                got = native._load_image_u8_unchecked(p, mode, size)
                # a half-readable file MAY decode; what it must never do is
                # crash or return a malformed array
                if got is not None:
                    assert got.dtype == np.uint8 and got.ndim == 3
    # and the threaded batch path with every image corrupt
    out = native.load_norm_batch_native(
        [tmp_path / f"{n}.bin" for n in cases], (16, 16),
        T.IMAGENET_MEAN, T.IMAGENET_STD, nthreads=4,
    )
    assert out is None


def test_decode_does_not_leak(lib, tmp_path):
    """ip_load_u8's malloc'd buffers are freed by the wrapper (ip_free in a
    finally) — 2000 decode+resize cycles must not grow RSS materially."""
    rng = np.random.default_rng(6)
    p = tmp_path / "img.jpg"
    Image.fromarray(rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)).save(
        p, quality=90
    )

    def rss_mb():
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE") / 1e6

    for _ in range(50):  # warm allocator pools
        native.load_image_u8(p, "RGB", (48, 48))
    before = rss_mb()
    for _ in range(2000):
        assert native.load_image_u8(p, "RGB", (48, 48)) is not None
    assert rss_mb() - before < 20.0, f"RSS grew {rss_mb() - before:.1f} MB"


def test_decode_parity_probe_passes_here(lib):
    """This host's libjpeg/libpng must match Pillow's (the CI baseline);
    elsewhere a mismatch downgrades to PIL decode instead of diverging."""
    assert native._decode_parity_ok() is True


def test_failed_decode_parity_disables_decode_keeps_resize(lib, image_files, monkeypatch):
    """A host failing the decode-parity probe must fall back to PIL decode
    while keeping the (by-construction-exact) native resize, with outputs
    unchanged."""
    monkeypatch.setattr(native, "_decode_parity", False)
    assert native.load_image_u8(image_files["rgb.jpg"], "RGB") is None
    assert (
        native.load_norm_batch_native(
            [image_files["rgb.jpg"]], (16, 16), T.IMAGENET_MEAN, T.IMAGENET_STD
        )
        is None
    )
    # resize is decode-independent and stays native
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert native.resize_u8_native(arr, (4, 4)) is not None
    # loaders still produce the exact PIL-chain bytes through the fallback
    got = T.load_image_transform(image_files["rgb.jpg"], (32, 32))
    want = _pil_reference_image(image_files["rgb.jpg"], (32, 32)).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_env_gate_disables_native(tmp_path):
    """UCOD_NATIVE_IO=0 keeps the library unloaded (checked in a subprocess
    so the module-level cache in utils.native is fresh)."""
    import subprocess
    import sys

    code = (
        "import os; os.environ['UCOD_NATIVE_IO']='0';"
        "from ucod_dpl_tpu.utils import native;"
        "assert native.get_imagepipe_lib() is None"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr
