"""Host-side audio data pipeline.

TPU-native replacement for the reference's external
`audiolm_pytorch.data.SoundDataset` + torch DataLoader
(`/root/reference/naturalspeech2_pytorch/naturalspeech2_pytorch.py:1759-1772`):
folder of audio files → load → resample to the codec rate → random-crop to
``max_length`` → pad to ``seq_len_multiple_of`` → fixed-shape numpy batches
ready for `jax.device_put` onto a data-sharded mesh.

Decoding uses the native C++ loader (`native/audioio`) when built, falling
back to scipy/wave for WAV. Fixed output shapes keep every training step at
one compiled XLA program.
"""

from __future__ import annotations

import random
import wave
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

# mp3/ogg decode through the native library's dlopen'd system codecs
# (libmpg123/libvorbisfile) — the torchaudio container coverage of the
# reference's SoundDataset (audiolm_pytorch import, ref :24)
AUDIO_EXTS = (".wav", ".flac", ".mp3", ".ogg")


def _load_wav_python(path: str):
    """Pure-python/scipy WAV loader → (float32 mono [-1,1], sample_rate)."""
    try:
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        data = np.asarray(data)
    except Exception:
        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
            data = np.frombuffer(raw, dtype=dtype).reshape(-1, w.getnchannels())

    if data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    elif np.issubdtype(data.dtype, np.integer):
        data = data.astype(np.float32) / float(np.iinfo(data.dtype).max)
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=-1)
    return data, sr


def load_audio(path: str):
    """Load an audio file → (float32 mono, sample_rate). Uses the native C++
    decoder when available."""
    try:
        from naturalspeech2_tpu.native import audioio

        return audioio.load(path)
    except Exception:
        pass
    if str(path).lower().endswith(".wav"):
        try:
            return _load_wav_python(path)
        except Exception as e:
            raise ValueError(f"cannot decode {path}: {e}") from e
    raise ValueError(
        f"cannot decode {path}: build the native audio loader (make -C native) "
        "or provide WAV input"
    )


def decode_audio_bytes(raw: bytes, suffix: str = ".wav"):
    """In-memory audio blob (e.g. an HTTP upload) → (float32 mono, sr).
    Routes through `load_audio` so the native mp3/ogg/flac decoders apply
    when built; ``suffix`` hints the container for the fallback path."""
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=suffix) as f:
        f.write(raw)
        f.flush()
        return load_audio(f.name)


def resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    if sr == target_sr:
        return audio
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr, target_sr)
    return resample_poly(audio, target_sr // g, sr // g).astype(np.float32)


class SoundDataset:
    """Folder of audio → fixed-shape float32 crops (reference SoundDataset
    contract: resample, random-crop ``max_length``, pad to hop multiple)."""

    def __init__(
        self,
        folder: str,
        max_length: int,
        target_sample_hz: int = 24000,
        seq_len_multiple_of: Optional[int] = None,
        seed: int = 0,
        split: Optional[str] = None,
        val_fraction: float = 0.05,
    ):
        """``split``: None (all files), "train", or "val" — a deterministic
        per-file hash split (stable across runs and machines, independent
        of folder ordering), ``val_fraction`` of files going to "val"."""
        self.paths: List[Path] = sorted(
            p for p in Path(folder).rglob("*") if p.suffix.lower() in AUDIO_EXTS
        )
        if split is not None:
            import zlib

            assert split in ("train", "val"), split
            assert 0.0 < val_fraction < 1.0, val_fraction

            def is_val(p: Path) -> bool:
                h = zlib.crc32(p.name.encode()) / 0xFFFFFFFF
                return h < val_fraction

            self.paths = [
                p for p in self.paths if is_val(p) == (split == "val")
            ]
        assert len(self.paths) > 0, (
            f"no audio files found in {folder}"
            + (f" for split={split!r} (val_fraction={val_fraction})"
               if split else "")
        )
        self.max_length = max_length
        self.target_sample_hz = target_sample_hz
        self.seq_len_multiple_of = seq_len_multiple_of
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> np.ndarray:
        audio, sr = load_audio(str(self.paths[idx]))
        audio = resample(audio, sr, self.target_sample_hz)

        target = self.max_length
        if len(audio) > target:
            start = self.rng.randint(0, len(audio) - target)
            audio = audio[start : start + target]
        elif len(audio) < target:
            audio = np.pad(audio, (0, target - len(audio)))

        if self.seq_len_multiple_of:
            m = self.seq_len_multiple_of
            usable = (len(audio) // m) * m
            audio = audio[:usable]
        return audio.astype(np.float32)


def data_loader(
    dataset: SoundDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    prefetch: int = 2,
) -> Iterator[np.ndarray]:
    """Infinite iterator of ``[batch, max_length]`` float32 batches
    (the reference cycles its DataLoader, :1825-1831). Batches are decoded
    on a background thread (``prefetch`` deep) so host IO overlaps device
    steps — the reference leans on torch DataLoader workers for this."""

    if drop_last and len(dataset) < batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} items < batch_size={batch_size} with "
            "drop_last=True: no batch can ever be produced (use a smaller "
            "batch or drop_last=False)"
        )

    def produce() -> Iterator[np.ndarray]:
        rng = random.Random(seed)
        order = list(range(len(dataset)))
        while True:
            if shuffle:
                rng.shuffle(order)
            for i in range(
                0, len(order) - (batch_size - 1 if drop_last else 0), batch_size
            ):
                idxs = order[i : i + batch_size]
                if len(idxs) < batch_size:
                    idxs = idxs + order[: batch_size - len(idxs)]
                yield np.stack([dataset[j] for j in idxs])

    if prefetch <= 0:
        yield from produce()
        return

    import queue
    import threading

    q: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=prefetch)

    def worker():
        for batch in produce():
            q.put(batch)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        yield q.get()
