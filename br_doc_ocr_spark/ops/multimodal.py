"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched kernels.

This is the graft rendering of the reference's image preprocessing stack
(``/root/reference/src/br_doc_ocr/services/preprocessing.py``): load (S1) →
normalize (M5) → resize (M4) → orientation (M6) → multi-crop (M7/M8) — with
the pixel work behind a pluggable decoder because the sandbox ships no
image/audio libraries. The Spark-side plumbing — schema, partitioning, UDF
signatures, Arrow batch shapes — is real and tested; the decoder is either

- :class:`FakeDecoder` (default): deterministic bytes→"pixels" synthesis so
  every downstream stage (resize / orient / frame-sample / feature-extract)
  runs end-to-end with checkable numbers,
- :class:`PngDecoder` / :class:`JpegDecoder` / :class:`ImageDecoder`:
  REAL image decode with no external dependency — stdlib-zlib PNG baseline
  profile (:mod:`pngio`) and baseline-JPEG per ITU T.81 (:mod:`jpegio`);
  :class:`ImageDecoder` sniffs the payload's magic bytes and routes to the
  right codec, so the image family runs end-to-end on real bytes of both
  dominant web formats even in this library-less sandbox, or
- :class:`WavDecoder`: REAL audio decode with no external dependency —
  stdlib-struct RIFF/WAVE PCM + IEEE-float profile (:mod:`wavio`), so the
  audio family runs end-to-end on real bytes just like the image family, or
- :class:`LibraryDecoder`: the full-codec path — PIL-backed image decode
  behind an import gate (the reference's own dependency) with a
  dependency-free fallback for PNG/JPEG payloads, RIFF audio payloads
  routed to :class:`WavDecoder`, compressed audio and video raising
  ``NotImplementedError`` with the exact swap instructions
  (torchaudio/PyAV) — the clearly-marked stubs a production deployment
  replaces.

Schema:

    media(media_id long, kind string in {image,audio,video},
          payload binary,
          meta struct<width:int, height:int, n_frames:int,
                      sample_rate:int, format:string>)
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int, "
    "format:string>"
)

MAX_DIMENSION = 1024  # reference resize cap (preprocessing.py:66-96)


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------

class FakeDecoder:
    """Deterministic payload→array synthesis: a blake2b keystream shaped by
    the metadata. Every byte of output is a pure function of (payload, meta),
    so resize/orient/feature stages have exact, replayable expectations."""

    @staticmethod
    def _keystream(payload: bytes, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint8)
        pos = 0
        counter = 0
        while pos < n:
            block = hashlib.blake2b(payload, digest_size=64,
                                    salt=counter.to_bytes(8, "big")).digest()
            take = min(64, n - pos)
            out[pos:pos + take] = np.frombuffer(block[:take], dtype=np.uint8)
            pos += take
            counter += 1
        return out

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        """→ uint8 array (height, width, 3)."""
        return self._keystream(payload, height * width * 3).reshape(
            height, width, 3)

    def decode_audio(self, payload: bytes, n_samples: int) -> np.ndarray:
        """→ float32 waveform in [-1, 1)."""
        raw = self._keystream(payload, n_samples)
        return (raw.astype(np.float32) - 128.0) / 128.0

    def decode_video_frame(self, payload: bytes, frame_idx: int,
                           width: int, height: int) -> np.ndarray:
        frame_payload = payload + frame_idx.to_bytes(4, "big")
        return self.decode_image(frame_payload, width, height)


class PngDecoder:
    """REAL image decode, zero external dependencies: payloads are PNG
    bytes, decoded by the stdlib-zlib + NumPy codec in :mod:`pngio`
    (baseline profile: 8-bit gray/RGB/palette/alpha, all scanline filters;
    alpha composites on white = the reference's normalize_image M5). The
    file's own dimensions are authoritative; mismatched metadata raises
    rather than silently mis-shaping downstream features."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        from br_doc_ocr_spark.ops import pngio

        img = pngio.decode_png(payload)
        h, w = img.shape[:2]
        if (w, h) != (width, height):
            raise ValueError(
                f"media metadata says {width}x{height} but the PNG decodes "
                f"to {w}x{h} — refusing to feature-extract mislabeled media")
        return img

    def decode_audio(self, payload: bytes, n_samples: int):
        raise NotImplementedError(
            "PngDecoder handles images only; route audio rows to another "
            "decoder")

    def decode_video_frame(self, payload: bytes, frame_idx: int,
                           width: int, height: int):
        raise NotImplementedError(
            "PngDecoder handles images only; route video rows to another "
            "decoder")


class JpegDecoder:
    """REAL image decode, zero external dependencies: payloads are baseline
    JPEG bytes, decoded by the stdlib + NumPy codec in :mod:`jpegio`
    (ITU T.81 baseline profile: 8-bit Huffman sequential, gray/YCbCr,
    4:4:4 / 4:2:2 / 4:2:0, restart markers). Grayscale decodes to
    replicated RGB channels (the seam's RGB contract). The file's own
    dimensions are authoritative; mismatched metadata raises rather than
    silently mis-shaping downstream features."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        from br_doc_ocr_spark.ops import jpegio

        img = jpegio.decode_jpeg(payload)
        h, w = img.shape[:2]
        if (w, h) != (width, height):
            raise ValueError(
                f"media metadata says {width}x{height} but the JPEG decodes "
                f"to {w}x{h} — refusing to feature-extract mislabeled media")
        return img

    def decode_audio(self, payload: bytes, n_samples: int):
        raise NotImplementedError(
            "JpegDecoder handles images only; route audio rows to another "
            "decoder")

    def decode_video_frame(self, payload: bytes, frame_idx: int,
                           width: int, height: int):
        raise NotImplementedError(
            "JpegDecoder handles images only; route video rows to another "
            "decoder")


def _sniff_image_format(payload: bytes) -> str | None:
    """'png' / 'jpeg' / None by magic bytes — the ONE place the
    dependency-free formats are enumerated (ImageDecoder routing and
    LibraryDecoder's no-PIL fallback both consult it)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return None


class ImageDecoder:
    """Format-sniffing REAL image decoder: routes each payload by its magic
    bytes — PNG signature → :class:`PngDecoder`, JPEG SOI (FF D8) →
    :class:`JpegDecoder` — so one kernel run handles a mixed-format media
    table without a per-format pre-partition. Unknown magic raises naming
    the leading bytes (never a silent fake)."""

    def __init__(self):
        self._png = PngDecoder()
        self._jpeg = JpegDecoder()

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        fmt = _sniff_image_format(payload)
        if fmt == "png":
            return self._png.decode_image(payload, width, height)
        if fmt == "jpeg":
            return self._jpeg.decode_image(payload, width, height)
        raise ValueError(
            f"unrecognized image payload (leading bytes "
            f"{payload[:4].hex()}); PNG and baseline JPEG are decodable "
            f"dependency-free, other formats need LibraryDecoder")

    def decode_audio(self, payload: bytes, n_samples: int):
        raise NotImplementedError(
            "ImageDecoder handles images only; route audio rows to another "
            "decoder")

    def decode_video_frame(self, payload: bytes, frame_idx: int,
                           width: int, height: int):
        raise NotImplementedError(
            "ImageDecoder handles images only; route video rows to another "
            "decoder")


class WavDecoder:
    """REAL audio decode, zero external dependencies: payloads are
    RIFF/WAVE bytes, decoded by the stdlib-struct + NumPy codec in
    :mod:`wavio` (PCM 8/16/24/32-bit and IEEE float 32/64). Multi-channel
    audio downmixes to mono by channel mean (deterministic). The file's
    own sample rate is authoritative; mismatched metadata raises rather
    than silently mis-labeling downstream features — the same contract as
    the image decoders (the kernel passes ``meta.sample_rate`` as the
    expected rate)."""

    def decode_audio(self, payload: bytes, n_samples: int) -> np.ndarray:
        from br_doc_ocr_spark.ops import wavio

        wave, rate = wavio.decode_wav(payload)
        if rate != n_samples:
            raise ValueError(
                f"media metadata says sample_rate={n_samples} but the WAV "
                f"header says {rate} — refusing to feature-extract "
                f"mislabeled media")
        return wave.mean(axis=1)

    def decode_image(self, payload: bytes, width: int, height: int):
        raise NotImplementedError(
            "WavDecoder handles audio only; route image rows to another "
            "decoder")

    def decode_video_frame(self, payload: bytes, frame_idx: int,
                           width: int, height: int):
        raise NotImplementedError(
            "WavDecoder handles audio only; route video rows to another "
            "decoder")


class AviDecoder:
    """REAL video decode, zero external dependencies: payloads are AVI
    (RIFF) containers with an MJPG or uncompressed-DIB video stream,
    parsed and frame-decoded by :mod:`aviio` (MJPG frames through the
    :mod:`jpegio` baseline-JFIF codec; DIB frames via one NumPy BGR
    unpack). The container's own dimensions are authoritative; mismatched
    metadata raises rather than silently mis-shaping downstream features —
    the same contract as the image decoders."""

    def decode_video_frame(self, payload: bytes, frame_idx: int,
                           width: int, height: int) -> np.ndarray:
        from br_doc_ocr_spark.ops import aviio

        info = aviio.parse_avi(payload)
        if (info.width, info.height) != (width, height):
            raise ValueError(
                f"media metadata says {width}x{height} but the AVI stream "
                f"is {info.width}x{info.height} — refusing to "
                f"feature-extract mislabeled media")
        return aviio.decode_avi_frame(payload, frame_idx)

    def decode_image(self, payload: bytes, width: int, height: int):
        raise NotImplementedError(
            "AviDecoder handles video only; route image rows to another "
            "decoder")

    def decode_audio(self, payload: bytes, n_samples: int):
        raise NotImplementedError(
            "AviDecoder handles video only; route audio rows to another "
            "decoder")


class LibraryDecoder:
    """The full-codec production decoder. Image decode uses PIL when it is
    installed (the reference's own dependency, ``services/preprocessing.py:
    25-63``) — gated behind an import; without PIL, PNG and baseline-JPEG
    payloads fall back to the dependency-free codecs (:class:`ImageDecoder`)
    and only genuinely other formats get the clear error. Audio/video
    remain documented stubs (torchaudio / PyAV)."""

    _builtin = None  # lazy shared ImageDecoder for the no-PIL fallback

    def decode_image(self, payload: bytes, width: int, height: int):
        try:
            from PIL import Image  # noqa: PLC0415
        except ImportError as e:
            if _sniff_image_format(payload) is not None:
                if self._builtin is None:
                    self._builtin = ImageDecoder()
                return self._builtin.decode_image(payload, width, height)
            raise NotImplementedError(
                "general image decode requires PIL (Image.open over the "
                "payload bytes) — not installed in this environment; PNG "
                "and baseline-JPEG payloads work dependency-free via "
                "ImageDecoder") from e
        import io

        img = Image.open(io.BytesIO(payload))
        # ANY alpha source (RGBA, LA, PA, palette with tRNS transparency)
        # composites on white — normalize_image M5, and the same pixels the
        # dependency-free codecs produce for the same bytes (a plain
        # convert('RGB') would DROP alpha instead of compositing it)
        if img.mode in ("RGBA", "LA", "PA") or (
                img.mode == "P" and "transparency" in img.info):
            img = img.convert("RGBA")
            bg = Image.new("RGB", img.size, (255, 255, 255))
            bg.paste(img, mask=img.split()[3])
            img = bg
        elif img.mode != "RGB":
            img = img.convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
        # the same decoded-vs-metadata contract PngDecoder/JpegDecoder
        # enforce: without it a mislabeled row either crashes the kernel
        # with an IndexError OUTSIDE the (ValueError, OSError) quarantine
        # (decoded smaller than metadata — one bad blob kills the partition
        # even under on_error='skip') or silently computes features from a
        # top-left crop with misreported dimensions (decoded larger)
        # (review r05)
        if arr.shape[:2] != (height, width):
            raise ValueError(
                f"media metadata says {width}x{height} but the payload "
                f"decodes to {arr.shape[1]}x{arr.shape[0]} — refusing "
                f"mismatched metadata")
        return arr

    _wav = None  # lazy shared WavDecoder for the RIFF fallback

    def decode_audio(self, payload: bytes, n_samples: int):
        if payload[:4] == b"RIFF":
            # WAV/PCM is decodable dependency-free, mirroring the image
            # fallback — only genuinely compressed formats need the library
            if self._wav is None:
                self._wav = WavDecoder()
            return self._wav.decode_audio(payload, n_samples)
        raise NotImplementedError(
            "compressed audio decode requires torchaudio/soundfile — not "
            "available in this environment; WAV/PCM payloads work "
            "dependency-free via WavDecoder")

    _avi = None  # lazy shared AviDecoder for the RIFF/AVI fallback

    def decode_video_frame(self, payload: bytes, frame_idx: int,
                           width: int, height: int):
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            # MJPG/DIB-in-AVI is decodable dependency-free, mirroring the
            # image and audio fallbacks — only genuinely inter-frame-coded
            # formats (H.264/VP9/...) need the library
            if self._avi is None:
                self._avi = AviDecoder()
            return self._avi.decode_video_frame(payload, frame_idx,
                                                width, height)
        raise NotImplementedError(
            "inter-frame video decode requires PyAV — not available in "
            "this environment; MJPG/DIB-in-AVI payloads work "
            "dependency-free via AviDecoder")


# ---------------------------------------------------------------------------
# Kernels (mapInPandas — Arrow batches in, Arrow batches out)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_DDL = (
    "media_id long, out_width int, out_height int, "
    "mean_intensity double, band_means array<double>, phash long"
)


def _resize_dims(width: int, height: int, max_dim: int = MAX_DIMENSION
                 ) -> tuple[int, int]:
    """Aspect-preserving downscale to max_dim, never upscale — the exact
    resize contract of preprocessing.py:66-96."""
    longest = max(width, height)
    if longest <= max_dim:
        return width, height
    scale = max_dim / longest
    return max(int(width * scale), 1), max(int(height * scale), 1)


def image_feature_kernel(decoder=None, on_error: str = "raise"):
    """decode → resize → per-band means → perceptual hash, per Arrow batch.

    ``on_error='skip'`` quarantines corrupt payloads at ROW granularity:
    a decode ValueError drops that row instead of failing the whole task
    (at cluster scale one bad blob must not kill a 128 MB scan partition
    after retry exhaustion — SCALE.md "Multimodal decode"). The default
    stays ``'raise'``: small curated corpora should fail loudly."""
    decoder = decoder or FakeDecoder()
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload, meta in zip(batch["media_id"],
                                               batch["payload"], batch["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                try:
                    img = decoder.decode_image(bytes(payload), w, h)
                except (ValueError, OSError):
                    # OSError too: PIL's UnidentifiedImageError (corrupt or
                    # unknown-format payload under LibraryDecoder) subclasses
                    # OSError, not ValueError — without it, with PIL installed
                    # one bad blob would still kill the whole partition,
                    # defeating the quarantine contract (ADVICE r04)
                    if on_error == "skip":
                        continue
                    raise
                ow, oh = _resize_dims(w, h)
                # nearest-neighbor resize via index striding (vectorized)
                yi = (np.arange(oh) * (h / oh)).astype(int)
                xi = (np.arange(ow) * (w / ow)).astype(int)
                small = img[yi][:, xi]
                gray = small.mean(axis=2)
                # 8x8 average-hash (classic pHash-lite): threshold on mean
                ty = (np.arange(8) * (oh / 8)).astype(int)
                tx = (np.arange(8) * (ow / 8)).astype(int)
                tiny = gray[ty][:, tx]
                bits = (tiny > tiny.mean()).flatten()
                phash = 0
                for b in bits:
                    phash = (phash << 1) | int(b)
                phash -= (phash >> 63) << 64  # to signed 64-bit
                rows.append((int(media_id), ow, oh,
                             float(small.mean()),
                             [float(small[:, :, c].mean()) for c in range(3)],
                             phash))
            yield pd.DataFrame(rows, columns=[
                "media_id", "out_width", "out_height", "mean_intensity",
                "band_means", "phash"])

    return run


AUDIO_FEATURES_DDL = (
    "media_id long, n_samples int, rms double, zero_crossings int, "
    "frame_energy array<double>"
)


def audio_feature_kernel(decoder=None, frame_size: int = 1024,
                         on_error: str = "raise"):
    """decode → RMS / zero-crossing / framed energy, per Arrow batch.

    ``on_error='skip'`` quarantines corrupt payloads at ROW granularity,
    same contract as :func:`image_feature_kernel` (one bad blob must not
    kill a scan partition at cluster scale). ``n_samples`` reports the
    DECODED length — for :class:`FakeDecoder` that equals the metadata
    rate by construction; for real WAV payloads it is the file's truth."""
    decoder = decoder or FakeDecoder()
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload, meta in zip(batch["media_id"],
                                               batch["payload"], batch["meta"]):
                n = int(meta["sample_rate"])  # 1 second of synthetic audio
                try:
                    wave = decoder.decode_audio(bytes(payload), n)
                except (ValueError, OSError):
                    if on_error == "skip":
                        continue
                    raise
                n_out = int(wave.shape[0])
                zc = int(np.sum(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
                n_frames = max(n_out // frame_size, 1)
                energy = [float(np.sqrt(np.mean(
                    wave[i * frame_size:(i + 1) * frame_size] ** 2)))
                    for i in range(n_frames)]
                rows.append((int(media_id), n_out,
                             float(np.sqrt(np.mean(wave ** 2))), zc, energy))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_samples", "rms", "zero_crossings",
                "frame_energy"])

    return run


VIDEO_FRAMES_DDL = (
    "media_id long, frame_idx int, mean_intensity double, phash long"
)


def video_frame_sample_kernel(decoder=None, every_nth: int = 10,
                              on_error: str = "raise"):
    """frame-sample (every_nth) → per-frame decode → intensity + hash.
    1→N flatMap: one output row per sampled frame (M7 explode shape).

    ``on_error='skip'`` quarantines corrupt payloads at MEDIA granularity —
    a decode ValueError/OSError drops ALL of that video's frames (a
    half-sampled video would silently skew frame-level dedup/aggregation)
    instead of failing the task, the same cluster-scale contract as
    :func:`image_feature_kernel`."""
    decoder = decoder or FakeDecoder()
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, payload, meta in zip(batch["media_id"],
                                               batch["payload"], batch["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                media_rows = []
                try:
                    _sample_one(decoder, media_rows, int(media_id),
                                bytes(payload), int(meta["n_frames"]),
                                every_nth, w, h)
                except (ValueError, OSError):
                    if on_error == "skip":
                        continue
                    raise
                rows.extend(media_rows)
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "mean_intensity", "phash"])

    return run


def _sample_one(decoder, rows: list, media_id: int, payload: bytes,
                n_frames: int, every_nth: int, w: int, h: int) -> None:
    for frame_idx in range(0, n_frames, every_nth):
        frame = decoder.decode_video_frame(payload, frame_idx, w, h)
        gray = frame.mean(axis=2)
        # 8x8 STRIDED downsample of the whole frame, same as
        # image_feature_kernel — the raw top-left 8x8 corner of a real
        # (smooth) frame is near-uniform, so its bits were a degenerate,
        # frame-content-independent pattern that made phash-based frame
        # dedup useless (review r05; latent under FakeDecoder's noise
        # frames)
        ty = (np.arange(8) * (h / 8)).astype(int)
        tx = (np.arange(8) * (w / 8)).astype(int)
        tiny = gray[ty][:, tx]
        bits = (tiny > tiny.mean()).flatten()
        phash = 0
        for b in bits:
            phash = (phash << 1) | int(b)
        phash -= (phash >> 63) << 64
        rows.append((media_id, frame_idx, float(frame.mean()), phash))


# ---------------------------------------------------------------------------
# DataFrame-level API
# ---------------------------------------------------------------------------

def image_features(media: DataFrame, decoder=None,
                   on_error: str = "raise") -> DataFrame:
    imgs = media.filter(media.kind == "image")
    return imgs.mapInPandas(image_feature_kernel(decoder, on_error),
                            schema=IMAGE_FEATURES_DDL)


def audio_features(media: DataFrame, decoder=None,
                   on_error: str = "raise") -> DataFrame:
    auds = media.filter(media.kind == "audio")
    return auds.mapInPandas(audio_feature_kernel(decoder, on_error=on_error),
                            schema=AUDIO_FEATURES_DDL)


def sample_video_frames(media: DataFrame, decoder=None,
                        every_nth: int = 10,
                        on_error: str = "raise") -> DataFrame:
    vids = media.filter(media.kind == "video")
    return vids.mapInPandas(
        video_frame_sample_kernel(decoder, every_nth, on_error=on_error),
        schema=VIDEO_FRAMES_DDL)


def _synth_gradient(i: int, width: int, height: int) -> np.ndarray:
    """The shared seeded RGB gradient recipe behind both real-codec synth
    corpora — one definition so the PNG and JPEG test images cannot drift."""
    x = np.arange(width, dtype=np.uint32)
    y = np.arange(height, dtype=np.uint32)[:, None]
    return np.stack([
        ((x + 7 * i) % 256 + 0 * y).astype(np.uint8)
        + np.zeros((height, width), np.uint8),
        ((y * 3 + i) % 256).astype(np.uint8)
        + np.zeros((height, width), np.uint8),
        ((x[None, :] + y * 2 + i * 13) % 256).astype(np.uint8),
    ], axis=2)


def _synth_media_df(spark: SparkSession, rows: tuple) -> DataFrame:
    """Cached-rows → DataFrame. Meta dicts are copied per call so a cached
    tuple can never be mutated through a returned frame; payloads are
    immutable ``bytes`` already."""
    import pandas as pd  # noqa: F811

    pdf = pd.DataFrame(
        [(mid, kind, payload, dict(meta)) for mid, kind, payload, meta in rows],
        columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA_DDL)


@lru_cache(maxsize=4)
def _synth_png_rows(n: int) -> tuple:
    from br_doc_ocr_spark.ops import pngio

    rows = []
    for i in range(n):
        width = 96 + (i % 5) * 288   # 96..1248: crosses MAX_DIMENSION
        height = 64 + (i % 7) * 192
        img = _synth_gradient(i, width, height)
        rows.append((i, "image", pngio.encode_png(img), (
            ("width", width), ("height", height), ("n_frames", 1),
            ("sample_rate", 0), ("format", "png"))))
    return tuple(rows)


def synth_png_media(spark: SparkSession, n: int = 12) -> DataFrame:
    """Deterministic REAL-PNG media table: seeded RGB gradient images
    encoded to actual PNG bytes (pngio.encode_png), metadata matching the
    encoded dimensions — the e2e corpus for :class:`PngDecoder`. Dimensions
    cross MAX_DIMENSION so the resize path is exercised on real decodes.

    Payload rows are lru-cached: the corpora are pure functions of their
    parameters and the pure-Python encoders dominate the driver-side cost
    of a repeat invocation (~1.1 s/call across the three image/video
    corpora), so the catalog query and best-of-N bench pay encode once per
    process, not once per run."""
    return _synth_media_df(spark, _synth_png_rows(n))


def synth_jpeg_media(spark: SparkSession, n: int = 8,
                     start_id: int = 0) -> DataFrame:
    """Deterministic REAL-JPEG media table: seeded RGB gradients encoded to
    actual baseline-JFIF bytes (jpegio.encode_jpeg), alternating 4:4:4 and
    4:2:0 so the decoder's chroma-upsample path is exercised; metadata
    matches the encoded dimensions. Sizes stay modest because the frozen
    catalog goldens pin these exact images (the resize-above-cap path is
    exercised on real bytes by the PNG corpus); decode throughput is no
    longer the constraint — the r05 LUT entropy decoder measures ~0.8 MB/s
    of compressed input per core (bench.py `jpeg_decode_mb_s`). Rows are
    lru-cached (see :func:`synth_png_media`)."""
    return _synth_media_df(spark, _synth_jpeg_rows(n, start_id))


@lru_cache(maxsize=4)
def _synth_jpeg_rows(n: int, start_id: int) -> tuple:
    from br_doc_ocr_spark.ops import jpegio

    rows = []
    for i in range(n):
        width = 96 + (i % 5) * 48    # 96..288
        height = 64 + (i % 7) * 32   # 64..256
        img = _synth_gradient(i, width, height)
        sub = "4:2:0" if i % 2 else "4:4:4"
        payload = jpegio.encode_jpeg(img, quality=90, subsampling=sub)
        rows.append((start_id + i, "image", payload, (
            ("width", width), ("height", height), ("n_frames", 1),
            ("sample_rate", 0), ("format", "jpeg"))))
    return tuple(rows)


def synth_wav_media(spark: SparkSession, n: int = 8,
                    start_id: int = 0) -> DataFrame:
    """Deterministic REAL-WAV media table: seeded integer-frequency sine
    mixes quantized to int16 and encoded to actual RIFF/PCM bytes
    (wavio.encode_wav) — the e2e corpus for :class:`WavDecoder`. Rows
    alternate mono and stereo (the decoder's downmix path), and lengths
    vary around one second so the kernel's decoded-length reporting is
    exercised against file truth rather than metadata. Rows are lru-cached
    (see :func:`synth_png_media`)."""
    return _synth_media_df(spark, _synth_wav_rows(n, start_id))


@lru_cache(maxsize=4)
def _synth_wav_rows(n: int, start_id: int) -> tuple:
    from br_doc_ocr_spark.ops import wavio

    rows = []
    for i in range(n):
        rate = 8000
        length = rate + (i % 3) * 1000 - 500   # 7500..9500 samples
        t = np.arange(length, dtype=np.float64) / rate
        base = (0.5 * np.sin(2 * np.pi * (220 + 110 * (i % 4)) * t)
                + 0.25 * np.sin(2 * np.pi * (440 + 55 * i) * t))
        q = np.floor(base * 32767 + 0.5).astype(np.int16)
        if i % 2:
            # stereo: right channel phase-shifted by a quarter period
            right = np.roll(q, length // 17)
            samples = np.stack([q, right], axis=1)
        else:
            samples = q
        rows.append((start_id + i, "audio", wavio.encode_wav(samples, rate),
                     (("width", 0), ("height", 0), ("n_frames", 0),
                      ("sample_rate", rate), ("format", "wav"))))
    return tuple(rows)


def synth_avi_media(spark: SparkSession, n: int = 6,
                    start_id: int = 0) -> DataFrame:
    """Deterministic REAL-AVI media table: seeded per-frame RGB gradients
    packed into actual RIFF/AVI containers (aviio.encode_avi), alternating
    the MJPG codec (real per-frame baseline-JFIF decode through jpegio)
    and uncompressed 24-bit DIB (including an odd width so the 4-byte row
    stride is exercised) — the e2e corpus for :class:`AviDecoder`. Frame
    counts vary so the kernel's every_nth sampling crosses container
    boundaries; metadata matches the container truth. Rows are lru-cached
    (see :func:`synth_png_media` — at ~0.75 s of driver-side MJPG encode
    per build, this corpus is the one the cache exists for)."""
    return _synth_media_df(spark, _synth_avi_rows(n, start_id))


@lru_cache(maxsize=4)
def _synth_avi_rows(n: int, start_id: int) -> tuple:
    from br_doc_ocr_spark.ops import aviio

    rows = []
    for i in range(n):
        codec = "DIB" if i % 2 else "MJPG"
        # odd width on the DIB rows exercises the stride-padding unpack;
        # sizes stay modest because the frozen catalog goldens pin these
        # exact frames (MJPG decode measures ~0.8 MB/s/core — bench.py
        # `jpeg_decode_mb_s`)
        width = 96 + (i % 3) * 32 + (1 if codec == "DIB" else 0)
        height = 64 + (i % 2) * 32
        n_frames = 12 + (i % 3) * 9   # 12/21/30: 2-3 sampled at every_nth=10
        frames = [_synth_gradient(i * 101 + f * 7, width, height)
                  for f in range(n_frames)]
        payload = aviio.encode_avi(frames, fps=10.0, codec=codec)
        rows.append((start_id + i, "video", payload, (
            ("width", width), ("height", height), ("n_frames", n_frames),
            ("sample_rate", 0), ("format", "avi"))))
    return tuple(rows)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes; metadata
    spans small and above-cap dimensions so the resize path is exercised)."""
    import pandas as pd  # noqa: F811

    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(i.to_bytes(8, "big"),
                                  digest_size=32).digest()
        width = 320 + (i % 5) * 512     # 320..2368: crosses MAX_DIMENSION
        height = 240 + (i % 7) * 256
        rows.append((i, kind, bytearray(payload), {
            "width": width, "height": height,
            "n_frames": 30 + (i % 4) * 30,
            "sample_rate": 16000, "format": "synthetic"}))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA_DDL)
