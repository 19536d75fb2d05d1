"""Host-side image pipeline microbench: native C++ vs PIL chain.

Times the full decode -> resize(518) -> normalise chain over a synthetic
JPEG batch, three ways:
  * PIL chain (per-image Image.open/convert/resize + numpy normalise);
  * native, 1 thread (apples-to-apples kernel comparison);
  * native, N threads (the shipped path — one C++ call, no GIL).

Pure host benchmark (the device never runs): the pipeline feeds the cache
builds, so its rate bounds the one-time DINO sweep's input side.  NOTE the
axon dev host has a single usable core — the threaded number only shows
scaling on real multi-core TPU hosts.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
from PIL import Image

from ucod_dpl_tpu.data import transforms as T
from ucod_dpl_tpu.utils import native

N = int(os.environ.get("UCOD_BENCH_IMAGES", "48"))
SIZE = (518, 518)


def main():
    assert native.get_imagepipe_lib() is not None, "native pipeline unavailable"
    assert native._decode_parity_ok(), "decode parity probe failed on this host"
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(N):
            h, w = 480 + (i % 3) * 20, 640 - (i % 5) * 16
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            p = os.path.join(td, f"{i}.jpg")
            Image.fromarray(arr).save(p, quality=90)
            paths.append(p)

        def timeit(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn()
                best = min(best, time.perf_counter() - t0)
            return best, out

        t_pil, ref = timeit(
            lambda: np.stack([T._pil_load_image(p, SIZE) for p in paths])
        )
        t_nat1, out1 = timeit(
            lambda: native.load_norm_batch_native(
                paths, SIZE, T.IMAGENET_MEAN, T.IMAGENET_STD, nthreads=1
            )
        )
        nthreads = os.cpu_count() or 1
        t_natN, outN = timeit(
            lambda: native.load_norm_batch_native(
                paths, SIZE, T.IMAGENET_MEAN, T.IMAGENET_STD, nthreads=nthreads
            )
        )
        assert np.array_equal(out1, ref) and np.array_equal(outN, ref)
        print(f"images={N} target={SIZE} host_cpus={nthreads}")
        print(f"PIL chain        : {t_pil*1e3:7.1f} ms  ({N/t_pil:6.1f} img/s)")
        print(
            f"native 1 thread  : {t_nat1*1e3:7.1f} ms  ({N/t_nat1:6.1f} img/s)"
            f"  x{t_pil/t_nat1:.2f} vs PIL"
        )
        print(
            f"native {nthreads:2d} threads: {t_natN*1e3:7.1f} ms  ({N/t_natN:6.1f} img/s)"
            f"  x{t_pil/t_natN:.2f} vs PIL"
        )


if __name__ == "__main__":
    main()
