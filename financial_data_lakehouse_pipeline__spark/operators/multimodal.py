"""Multimodal column plumbing (LLM-data extension).

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata, processed in Arrow batches via mapInPandas. The Spark-side
plumbing — schema, batch iteration, partition sizing — is real and tested;
the actual media decoding is STUBBED (codec libraries are not in this
container): `decode_stub=True` derives deterministic fake features from
the payload bytes, and `decode_stub=False` raises NotImplementedError
where a real decoder (PIL/ffmpeg/torchaudio) would plug in.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of extract_media_features.
MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "sha256 string, width int, height int, feature_norm double"
)

#: Pluggable decoder contract: bytes -> (width, height, feature_norm).
MediaDecoder = Callable[[bytes], tuple[int, int, float]]


def png_header_decoder(payload: bytes) -> tuple[int, int, float]:
    """REAL (non-stub) decoder for PNG payloads, pure stdlib: validates
    the PNG signature and parses width/height out of the IHDR chunk
    (fixed offsets 16..24 per the PNG spec — header metadata needs no
    codec library). feature_norm = pixel count, a stand-in for whatever
    a full decoder would compute. Raises ValueError on non-PNG bytes —
    per-row decode errors should be quarantined upstream, not swallowed
    here."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("payload is not a PNG (bad signature)")
    width, height = struct.unpack(">II", payload[16:24])
    return int(width), int(height), float(width) * float(height)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a binary payload column (UTF-8 bytes of the text) plus media
    metadata — a stand-in for reading real image/audio blobs; the binary
    column type and downstream plumbing are exactly what real media uses."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    decode_stub: bool = True,
    decoder: MediaDecoder | None = None,
) -> DataFrame:
    """Per-payload feature extraction in Arrow batches (mapInPandas).

    Decode resolution order:

    1. ``decoder`` given — a pluggable ``bytes -> (width, height,
       feature_norm)`` callable runs per payload (``png_header_decoder``
       is the stdlib-only real example; plug PIL/ffmpeg the same way when
       available).
    2. ``decode_stub=True`` — deterministic pseudo-features derived from
       the sha256 digest, so the distributed plumbing is fully exercised
       without codec libraries.
    3. neither — NotImplementedError (honest gap, never silent fakes).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder is None and not decode_stub:
                raise NotImplementedError(
                    "no media decoder: pass decoder= (e.g. png_header_decoder) "
                    "or decode_stub=True"
                )
            payloads = pdf[payload_col]
            digests = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            if decoder is not None:
                decoded = [decoder(bytes(b)) for b in payloads]
                width = pd.Series([d[0] for d in decoded], index=pdf.index)
                height = pd.Series([d[1] for d in decoded], index=pdf.index)
                norm = pd.Series([d[2] for d in decoded], index=pdf.index)
            else:
                width = digests.map(lambda d: 64 + int(d[:2], 16))
                height = digests.map(lambda d: 64 + int(d[2:4], 16))
                norm = digests.map(lambda d: int(d[4:8], 16) / 65535.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": digests,
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "feature_norm": norm.astype("float64"),
                }
            )

    return df.mapInPandas(_batches, schema=MEDIA_FEATURE_SCHEMA)


#: Output schema of sample_frames.
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_chars bigint, frame_sha string"


def sample_frames(
    df: DataFrame,
    text_col: str = "text",
    n_frames: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling for video-like payloads: one input row → n_frames
    output rows, each a fixed-stride slice of the payload (mapInPandas
    with a 1→N fan-out — the exploding batch shape real frame extraction
    uses). The decode is STUBBED deterministically: 'frames' are equal
    character slices of the text payload, fingerprinted with sha256, so
    the distributed plumbing (Arrow batches, row fan-out, schema) is fully
    exercised and SQL-reproducible; a real decoder (ffmpeg) would replace
    the slicing with actual frame extraction at the marked line.
    """
    import hashlib as _hl

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg — not in this container"
                )
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_chars": [],
                "frame_sha": [],
            }
            for doc_id, txt in zip(pdf["doc_id"], pdf[text_col]):
                text = txt or ""
                sz = len(text) // n_frames
                for i in range(n_frames):
                    start = i * sz
                    end = start + sz if i < n_frames - 1 else len(text)
                    chunk = text[start:end]  # <- real decoder plugs in here
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_chars"].append(len(chunk))
                    out["frame_sha"].append(
                        _hl.sha256(chunk.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "frame_idx": "int32", "frame_chars": "int64"}
            )

    return df.mapInPandas(_batches, schema=FRAME_SCHEMA)


def wav_header_decoder(payload: bytes) -> tuple[int, int, float]:
    """REAL (non-stub) decoder for WAV payloads, pure stdlib: validates
    the RIFF/WAVE signature and parses the fmt chunk — returns
    (sample_rate, n_channels, duration_seconds). Header metadata needs
    no codec library, same as :func:`png_header_decoder`; a full
    spectrogram pipeline would plug in here via the same ``decoder=``
    hook. Raises ValueError on non-WAV bytes."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("payload is not a WAV (bad RIFF/WAVE signature)")
    pos, n = 12, len(payload)
    sample_rate = channels = bits = None
    data_bytes = 0
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            channels, sample_rate = struct.unpack("<HI", body[2:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif tag == b"data":
            data_bytes = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None:
        raise ValueError("WAV has no fmt chunk")
    frame_bytes = channels * (bits // 8)
    duration = (data_bytes / frame_bytes / sample_rate) if frame_bytes else 0.0
    return int(sample_rate), int(channels), float(duration)
