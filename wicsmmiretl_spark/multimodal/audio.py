"""Multimodal columns: audio as opaque BinaryType + typed metadata — the
audio sibling of ``multimodal/images.py`` (north star: treat image/audio/
video as binary columns; decode/feature-extract as Arrow-batched Pandas
UDFs).

Codec strategy mirrors the images module: no audio library ships in this
container, but PCM WAV (RIFF) needs none — the container format is a
44-byte header plus little-endian int16 samples, parsed and written here
with ``struct``/numpy alone. A compressed-codec decoder (mp3/ogg) would
plug in behind the same ``decode_wav``-shaped interface without changing
any plan; the Spark-side plumbing — binary column, mapInPandas batch
shape, applyInPandas grouping, schema, error-to-NULL paths — is the real
and tested part.

Scale design:

* Synthesis (``synth_wav``) groups the source stream by the audio key —
  ONE shuffle, the same exchange any per-entity sequence op pays; per-key
  sample counts are bounded by per-key event counts, so group skew equals
  input key skew, nothing amplified.
* Feature extraction (``audio_features``) is mapInPandas — zero shuffle,
  Arrow-batched, one pass over the binary column; per-row output, so the
  operator composes with any downstream filter/agg while the binary
  column itself is never shuffled unless the caller asks for it.
* Determinism: samples are int16, per-frame RMS is quantized with an
  explicit ``floor(x·10⁶ + 0.5)`` (round-half-up on both engines — NOT
  numpy's banker rounding), zero-crossings are integer counts — so a SQL
  oracle can replay features bit-for-bit from the pre-synthesis values.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_RIFF_HEADER = struct.Struct("<4sI4s4sIHHIIHH4sI")


def pcm16_wav_bytes(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Serialize int16 samples as a mono PCM16 RIFF/WAV byte string."""
    data = samples.astype("<i2").tobytes()
    hdr = _RIFF_HEADER.pack(
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,  # PCM fmt chunk size
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
        b"data",
        len(data),
    )
    return hdr + data


def parse_pcm16_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """Parse a mono PCM16 WAV byte string → (sample_rate, int16 samples).

    Raises ValueError on anything that is not the exact shape
    ``pcm16_wav_bytes`` writes (callers map failures to NULL rows — the
    same error-to-NULL contract as the image codecs).
    """
    if len(buf) < _RIFF_HEADER.size:
        raise ValueError("wav: truncated header")
    (riff, _, wave, fmt, fmt_size, codec, ch, rate, _, _, bits, data_tag, n) = (
        _RIFF_HEADER.unpack_from(buf)
    )
    if riff != b"RIFF" or wave != b"WAVE" or fmt != b"fmt " or data_tag != b"data":
        raise ValueError("wav: bad magic")
    if (fmt_size, codec, ch, bits) != (16, 1, 1, 16):
        raise ValueError("wav: only mono PCM16 supported")
    if len(buf) < _RIFF_HEADER.size + n:
        raise ValueError("wav: truncated data")
    samples = np.frombuffer(buf, dtype="<i2", offset=_RIFF_HEADER.size, count=n // 2)
    return rate, samples


def synth_wav(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    sample_col: str,
    sample_rate: int = 8000,
) -> DataFrame:
    """Assemble each key's ordered int16 sample stream into a WAV binary —
    the bridge from a relational event stream to an audio column (and the
    test-fixture generator the container's missing codecs would otherwise
    leave impossible).

    ``order_cols`` must be a total order within the key (suite-wide
    deterministic-order contract). ``sample_col`` must already be int16-
    ranged integers — synthesis does not rescale (keeping every sample
    derivable by the oracle).

    Output: key_col, audio binary, n_samples int. One shuffle (the
    applyInPandas grouping).
    """
    for c in (key_col, sample_col, *order_cols):
        if c not in df.columns:
            raise ValueError(f"synth_wav: column {c!r} not in {df.columns}")
    schema = StructType(
        [
            df.schema[key_col],
            StructField("audio", BinaryType()),
            StructField("n_samples", IntegerType()),
        ]
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        samples = pdf[sample_col].to_numpy(dtype=np.int64).astype(np.int16)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "audio": [pcm16_wav_bytes(samples, sample_rate)],
                "n_samples": [len(samples)],
            }
        )

    cols = [key_col, sample_col, *order_cols]
    return (
        df.select(*dict.fromkeys(cols))
        .filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .applyInPandas(build, schema)
    )


def audio_features(
    df: DataFrame,
    audio_col: str = "audio",
    frame_size: int = 64,
    scale: int = 10**6,
) -> DataFrame:
    """Frame-level audio features from a PCM16 WAV binary column: per-frame
    RMS energy averaged over frames, and the zero-crossing rate — the two
    classic cheap signal descriptors (speech/music/silence triage) every
    audio curation pass starts with.

    mapInPandas, zero shuffle: each Arrow batch's binaries are parsed and
    reduced to scalars in place; undecodable rows surface as NULL features
    (count them, don't crash the pipeline — the image-chain failure
    contract).

    Determinism contract: frames are consecutive ``frame_size`` sample
    blocks (the trailing partial frame included); per-frame RMS =
    sqrt(Σs²/cnt) is quantized ``floor(x·scale + 0.5)`` to an exact
    integer, and both output ratios are FLOOR-divided in integer micro
    units (``Σq // nf``, ``crossings·scale // (n-1)``) then divided by
    ``scale`` once — one correctly-rounded IEEE division, NO language
    round() call anywhere, so Python's banker rounding vs SQL's
    half-away rounding can never disagree. Zero-crossings are the exact
    count of strict sign flips between consecutive samples. All of it is
    replayable in SQL from the pre-synthesis sample values.

    Output: input columns minus the binary, plus sample_rate int,
    n_samples bigint, n_frames bigint, rms_mean double (micro-quantized),
    zcr double (micro-quantized; NULL when fewer than 2 samples).
    """
    if frame_size < 1:
        raise ValueError(f"audio_features: frame_size must be >= 1, got {frame_size}")
    if audio_col not in df.columns:
        raise ValueError(f"audio_features: {audio_col!r} not in {df.columns}")
    passthrough = [f for f in df.schema.fields if f.name != audio_col]
    schema = StructType(
        passthrough
        + [
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("n_frames", LongType()),
            StructField("rms_mean", DoubleType()),
            StructField("zcr", DoubleType()),
        ]
    )
    names = [f.name for f in passthrough]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {n: pdf[n] for n in names}
            rates, counts, frames, rms, zcr = [], [], [], [], []
            for buf in pdf[audio_col]:
                try:
                    rate, s = parse_pcm16_wav(bytes(buf))
                except (ValueError, TypeError):
                    rates.append(None), counts.append(None), frames.append(None)
                    rms.append(None), zcr.append(None)
                    continue
                n = len(s)
                nf = (n + frame_size - 1) // frame_size
                fr_q = []
                s64 = s.astype(np.int64)
                for i in range(nf):
                    blk = s64[i * frame_size : (i + 1) * frame_size]
                    r = float(np.sqrt(float(np.sum(blk * blk)) / len(blk)))
                    fr_q.append(int(np.floor(r * scale + 0.5)))
                crossings = int(np.sum((s64[:-1] * s64[1:]) < 0)) if n >= 2 else None
                rates.append(rate)
                counts.append(n)
                frames.append(nf)
                rms.append((sum(fr_q) // nf) / scale if nf else None)
                zcr.append((crossings * scale // (n - 1)) / scale if n >= 2 else None)
            out.update(
                sample_rate=pd.array(rates, dtype="Int32"),
                n_samples=pd.array(counts, dtype="Int64"),
                n_frames=pd.array(frames, dtype="Int64"),
                rms_mean=pd.array(rms, dtype="float64"),
                zcr=pd.array(zcr, dtype="float64"),
            )
            yield pd.DataFrame(out)

    return df.mapInPandas(extract, schema)
