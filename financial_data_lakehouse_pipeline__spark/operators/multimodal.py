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
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of extract_media_features.
MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "sha256 string, width int, height int, feature_norm double"
)


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
) -> DataFrame:
    """Per-payload feature extraction in Arrow batches (mapInPandas).

    With a real decoder this is where resize / frame-sample / spectrogram
    would run; the stub produces deterministic pseudo-features (sha256,
    fake dimensions from the digest) so the distributed plumbing is fully
    exercised and testable.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this container"
                )
            payloads = pdf[payload_col]
            digests = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": digests,
                    "width": digests.map(lambda d: 64 + int(d[:2], 16)).astype("int32"),
                    "height": digests.map(lambda d: 64 + int(d[2:4], 16)).astype("int32"),
                    "feature_norm": digests.map(lambda d: int(d[4:8], 16) / 65535.0),
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
