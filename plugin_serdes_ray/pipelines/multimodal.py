"""Multimodal column stages: image/audio/video as opaque binary columns
with typed metadata, processed by ACTOR-POOL map_batches stages (decoder
state built once per actor in __init__ — the stateful-stage pattern).

The actual media libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode kernels are deterministic fakes gated behind
try-imports (clearly marked); the Ray-side plumbing — schemas, byte-bounded
batch sizing, actor signatures, output layout — is real and tested, so
swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from ..util import package_runtime_env

# canonical multimodal schema fragments
IMAGE_META = pa.struct([("width", pa.int32()), ("height", pa.int32()),
                        ("format", pa.string())])


def _seed_from(data: bytes) -> int:
    return int.from_bytes(hashlib.sha1(data).digest()[:4], "little")


class ImageDecoder:
    """Actor-pool stage: binary image column -> fixed-size float features.

    Real path would do PIL decode + resize in __call__; here the fake
    'decode' derives a deterministic (size, channels-mean) feature vector
    from the payload bytes so the pipeline is testable end to end.
    """

    def __init__(self, column: str = "image", size: int = 32):
        self.column = column
        self.size = size
        try:  # real decoder, if ever available in the image
            from PIL import Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False

    def _decode(self, data: Optional[bytes]) -> np.ndarray:
        if data is None:
            return np.zeros(self.size, dtype=np.float32)
        if self._pil:  # pragma: no cover - library absent in this container
            raise NotImplementedError(
                "real PIL decode path: wire Image.open(BytesIO(data)) here")
        rng = np.random.default_rng(_seed_from(data))
        return rng.random(self.size, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(v) for v in batch.column(self.column).to_pylist()]
        return batch.append_column(
            "image_feat", pa.array([f.tolist() for f in feats],
                                   type=pa.list_(pa.float32())))


class AudioFeaturizer:
    """Actor-pool stage: binary audio column -> frame-level features
    (n_frames x n_mels flattened). Deterministic fake kernel."""

    def __init__(self, column: str = "audio", n_mels: int = 16, frames: int = 8):
        self.column = column
        self.n_mels = n_mels
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for v in batch.column(self.column).to_pylist():
            if v is None:
                out.append(np.zeros(self.frames * self.n_mels, dtype=np.float32).tolist())
                continue
            rng = np.random.default_rng(_seed_from(v))
            out.append(rng.random(self.frames * self.n_mels, dtype=np.float32).tolist())
        return batch.append_column(
            "audio_feat", pa.array(out, type=pa.list_(pa.float32())))


class FrameSampler:
    """Actor-pool stage: binary video column -> N sampled 'frames' (each a
    binary blob). Fake kernel slices the payload deterministically."""

    def __init__(self, column: str = "video", n_frames: int = 4):
        self.column = column
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for v in batch.column(self.column).to_pylist():
            if not v:
                out.append([])
                continue
            step = max(len(v) // self.n_frames, 1)
            out.append([v[i * step:(i + 1) * step] for i in range(self.n_frames)])
        return batch.append_column(
            "frames", pa.array(out, type=pa.list_(pa.large_binary())))


def decode_images(ds, column: str = "image", size: int = 32,
                  concurrency: int = 4, batch_size: int = 64):
    """Byte-heavy media => SMALL row batches (batch x concurrency bounded in
    bytes, SURVEY.md §4.2) and an actor pool (decoder state per actor)."""
    return ds.map_batches(
        ImageDecoder, fn_constructor_kwargs={"column": column, "size": size},
        batch_size=batch_size, batch_format="pyarrow",
        concurrency=concurrency, num_cpus=1,
        runtime_env=package_runtime_env())


def featurize_audio(ds, column: str = "audio", concurrency: int = 4,
                    batch_size: int = 64):
    return ds.map_batches(
        AudioFeaturizer, fn_constructor_kwargs={"column": column},
        batch_size=batch_size, batch_format="pyarrow",
        concurrency=concurrency, num_cpus=1,
        runtime_env=package_runtime_env())


def sample_frames(ds, column: str = "video", n_frames: int = 4,
                  concurrency: int = 4, batch_size: int = 16):
    return ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"column": column,
                                             "n_frames": n_frames},
        batch_size=batch_size, batch_format="pyarrow",
        concurrency=concurrency, num_cpus=1,
        runtime_env=package_runtime_env())
