"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): treat image/audio/video as
``binary`` columns with a metadata struct, processed by Arrow-batched
pandas functions over ``mapInPandas``. The Spark-side plumbing —
schema, partitioning, UDF signatures, batch shapes — is real and
tested. IMAGE payloads are decoded/resized FOR REAL via the pure-stdlib
PNG codec in ``multimodal/png.py`` and the pure-Python baseline JPEG
codec in ``multimodal/jpeg.py``; AUDIO payloads via the stdlib ``wave``
module (``decode_audio_batch``: header metadata + RMS / zero-crossing
features). This container has no PIL/cv2/av; production swaps them into
the same mapInPandas bodies. Remaining formats (progressive JPEG,
compressed audio, video) fall back to a documented deterministic stub
so the pipeline shape stays exercisable.

Scale notes:
- binary payloads ride the scan; metadata-only queries never touch
  them (parquet column pruning), so keep metadata in separate columns.
- mapInPandas streams Arrow batches: bound batch bytes with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
  large, and repartition by size bucket before heavy decode so task
  skew stays bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media metadata struct carried next to the binary payload
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("format", T.StringType(), True),       # png/jpeg/wav/mp4...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), False),
    ]
)

_STUB_UNKNOWN = True  # video/compressed-audio codecs unavailable
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SIG = b"\xff\xd8"


def _decode_pixels(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """Real pixel decode for the two in-repo codecs (PNG, baseline
    JPEG); None when the payload is neither or an unsupported variant
    (progressive JPEG, palette PNG, ...)."""
    data = bytes(payload)
    try:
        if data[:8] == _PNG_SIG:
            from projet_5spar_sparkstreaming_spark.multimodal.png import decode_png

            return decode_png(data)
        if data[:2] == _JPEG_SIG:
            from projet_5spar_sparkstreaming_spark.multimodal.jpeg import decode_jpeg

            return decode_jpeg(data)
        from projet_5spar_sparkstreaming_spark.multimodal.y4m import (
            Y4M_SIG,
            iter_y4m_frames,
            parse_y4m_header,
        )

        if data[: len(Y4M_SIG)] == Y4M_SIG:
            # video payloads feature-extract from the FIRST frame's
            # luma plane — the keyframe-thumbnail convention
            w, h, _fps, _cs, _off = parse_y4m_header(data)
            first = next(iter_y4m_frames(data), None)
            if first is not None:
                return w, h, 1, first[: w * h]
    except ValueError:
        # unsupported codec variant: degrade to the stub instead of
        # failing the Spark task
        return None
    return None


def _decode_bytes(payload: bytes) -> list[float]:
    """Decode a payload to a fixed 16-float feature vector.

    PNG and baseline JPEG payloads are REALLY decoded (multimodal/
    png.py, multimodal/jpeg.py): pixels -> grayscale -> 4x4
    nearest-neighbor thumbnail -> 16 floats in [0,1]. Anything else
    takes the documented deterministic stub (first 16 bytes scaled),
    kept so the pipeline is exercisable for formats whose codecs need
    external libraries.
    """
    decoded = _decode_pixels(payload)
    if decoded is not None:
        from projet_5spar_sparkstreaming_spark.multimodal.png import (
            resize_nearest,
            to_grayscale,
        )

        w, h, ch, pixels = decoded
        gray = to_grayscale(pixels, ch)
        thumb = resize_nearest(gray, w, h, 1, 4, 4)
        return [b / 255.0 for b in thumb]
    if not _STUB_UNKNOWN:
        raise NotImplementedError("wire a real codec (PIL/soundfile/av) here")
    # deterministic, shape-stable fake: first 16 bytes scaled to [0,1]
    head = payload[:16].ljust(16, b"\0")
    return [b / 255.0 for b in head]


def media_metadata(payload_col: str, media_type: str, fmt: str | None = None):
    """Metadata struct expression for a binary column (native, no UDF)."""
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).cast("string").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(F.col(payload_col)).cast("long").alias("size_bytes"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def decode_image_batch(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Binary payloads -> fixed-width feature vectors via mapInPandas.

    Arrow-batched: each iterator element is a pandas DataFrame chunk;
    the decode loop is per-row Python but amortized over Arrow transfer
    (the only viable shape for opaque codecs)."""
    id_name, payload_name = id_col, payload_col

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_name].astype("int64"),
                    "features": [ _decode_bytes(p) for p in pdf[payload_name] ],
                    "n_bytes": [len(p) for p in pdf[payload_name]],
                }
            )

    return df.mapInPandas(_decode, schema=_FEATURE_SCHEMA)


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
    ]
)


def decode_audio_batch(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode for PCM WAV payloads via the stdlib ``wave``
    module: header metadata (rate/channels/duration) plus two cheap
    signal features (RMS level, zero-crossing rate) computed with numpy
    over the int16 samples. Non-WAV / compressed formats raise — they
    genuinely need external codecs; this path covers the
    uncompressed-capture case with zero dependencies.
    """
    import io
    import wave

    import numpy as np

    id_name, payload_name = id_col, payload_col

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chans, durs, rmss, zcrs = [], [], [], [], []
            for p in pdf[payload_name]:
                try:
                    with wave.open(io.BytesIO(bytes(p))) as w:
                        if w.getsampwidth() != 2:
                            raise ValueError("only 16-bit PCM WAV supported")
                        rate = w.getframerate()
                        n = w.getnframes()
                        ch = w.getnchannels()
                        raw = w.readframes(n)
                except (wave.Error, EOFError) as e:
                    # same single-exception contract as the image/video
                    # codecs: corrupt payloads raise ValueError, not a
                    # stdlib-specific class callers would not expect
                    raise ValueError(f"invalid WAV payload: {e}") from e
                samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                rates.append(rate)
                chans.append(ch)
                durs.append(int(round(1000.0 * n / rate)))
                if len(samples):
                    rmss.append(round(float(np.sqrt(np.mean(samples**2))), 6))
                    signs = np.signbit(samples)
                    zcrs.append(
                        round(float(np.mean(signs[1:] != signs[:-1])), 6)
                        if len(samples) > 1
                        else 0.0
                    )
                else:
                    rmss.append(0.0)
                    zcrs.append(0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_name].astype("int64"),
                    "sample_rate": rates,
                    "n_channels": chans,
                    "duration_ms": durs,
                    "rms": rmss,
                    "zero_crossing_rate": zcrs,
                }
            )

    return df.mapInPandas(_decode, schema=_AUDIO_SCHEMA)


def extract_image_features(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Alias of the decode path with feature post-processing hook."""
    decoded = decode_image_batch(df, id_col, payload_col)
    return decoded.withColumn(
        "feature_norm",
        F.round(
            F.sqrt(
                F.aggregate(
                    "features", F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")
                )
            ),
            6,
        ),
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_image_batch(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize payloads; PNG and baseline JPEG are REALLY decoded,
    nearest-neighbor resampled, and re-encoded as PNG (multimodal/
    png.py, multimodal/jpeg.py). Unknown formats take the deterministic
    tile/truncate stub. Demonstrates the payload-rewriting mapInPandas
    shape: binary in -> binary out, metadata columns updated alongside
    so downstream metadata-only queries stay prunable."""
    id_name, payload_name = id_col, payload_col
    target = width * height

    def _resize_one(p) -> bytes:
        data = bytes(p)
        decoded = _decode_pixels(data)
        if decoded is not None:
            from projet_5spar_sparkstreaming_spark.multimodal.png import (
                encode_png,
                resize_nearest,
            )

            w, h, ch, pixels = decoded
            return encode_png(
                resize_nearest(pixels, w, h, ch, width, height),
                width,
                height,
                ch,
            )
        # deterministic size-normalized fake: tile/truncate bytes
        reps = -(-target // max(1, len(data)))
        return (data * reps)[:target]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_name].astype("int64"),
                    "payload": [_resize_one(p) for p in pdf[payload_name]],
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(_resize, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampler (1-row -> N-rows mapInPandas expansion).

    Y4M (YUV4MPEG2) payloads are REALLY demuxed (multimodal/y4m.py):
    every ``every_n``-th frame's luma plane is emitted as the frame
    payload. Compressed containers (mp4/webm) genuinely need external
    decoders and take the deterministic stub (fake byte-stream slices)
    so the pipeline shape stays exercisable.
    """
    from projet_5spar_sparkstreaming_spark.multimodal.y4m import (
        Y4M_SIG,
        iter_y4m_frames,
        parse_y4m_header,
    )

    id_name, payload_name = id_col, payload_col

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_name], pdf[payload_name]):
                data = bytes(payload)
                if data[: len(Y4M_SIG)] == Y4M_SIG:
                    w, h, _fps, _cs, _off = parse_y4m_header(data)
                    luma = w * h
                    for i, frame in enumerate(iter_y4m_frames(data)):
                        if i % every_n:
                            continue
                        ids.append(int(mid))
                        idxs.append(i)
                        frames.append(frame[:luma])  # Y plane
                    continue
                step = max(1, len(data) // every_n)
                for i in range(0, min(every_n, len(data))):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(data[i * step : i * step + step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(_sample, schema=_FRAME_SCHEMA)


_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fps", T.DoubleType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def decode_video_stats(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL video decode for Y4M payloads: container metadata (dims,
    frame rate, frame count, duration) plus mean luma over the actual
    decoded frames. Non-Y4M payloads raise — compressed video needs an
    external decoder; this covers the uncompressed-capture case with
    zero dependencies (the video twin of ``decode_audio_batch``)."""
    import numpy as np

    from projet_5spar_sparkstreaming_spark.multimodal.y4m import (
        iter_y4m_frames,
        parse_y4m_header,
    )

    id_name, payload_name = id_col, payload_col

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ns, fpss, durs, lumas = [], [], [], [], [], []
            for p in pdf[payload_name]:
                data = bytes(p)
                w, h, (fn, fd), _cs, _off = parse_y4m_header(data)
                luma = w * h
                total = 0.0
                count = 0
                for frame in iter_y4m_frames(data):
                    total += float(
                        np.frombuffer(frame[:luma], dtype=np.uint8).mean()
                    )
                    count += 1
                # zero denominator (F25:0 parses fine) must follow the
                # ValueError-only corruption contract, not crash the task
                fps = fn / fd if fd else 0.0
                ws.append(w)
                hs.append(h)
                ns.append(count)
                fpss.append(round(fps, 6))
                durs.append(int(round(1000.0 * count / fps)) if fps else 0)
                lumas.append(round(total / count, 6) if count else 0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_name].astype("int64"),
                    "width": ws,
                    "height": hs,
                    "n_frames": ns,
                    "fps": fpss,
                    "duration_ms": durs,
                    "mean_luma": lumas,
                }
            )

    return df.mapInPandas(_decode, schema=_VIDEO_SCHEMA)
