"""Native audio IO tests: WAV decode (8/16/24-bit), FLAC decode (via a
minimal in-test verbatim/constant FLAC encoder), windowed-sinc resampler."""

import struct
import wave

import numpy as np
import pytest

pytest.importorskip("naturalspeech2_tpu.native.audioio")
from naturalspeech2_tpu.native import audioio


SR = 24000


def sine(freq=440.0, seconds=0.5, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def write_wav16(path, audio, sr=SR, channels=1):
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    if channels == 2:
        pcm = np.stack([pcm, pcm], -1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


# --------------------------- minimal FLAC writer ----------------------- #


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def crc8(data):
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def encode_flac_verbatim(samples_int16, sr=SR):
    """Single-frame FLAC stream with one verbatim 16-bit mono subframe."""
    n = len(samples_int16)
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block, type 0, length 34)
    info = bytearray(34)
    info[0:2] = struct.pack(">H", 16)  # min block size
    info[2:4] = struct.pack(">H", max(n, 16))
    # sr(20) ch-1(3) bps-1(5) total(36)
    bits = (sr << 44) | ((1 - 1) << 41) | ((16 - 1) << 36) | n
    info[10:18] = bits.to_bytes(8, "big")
    out += bytes([0x80, 0, 0, 34]) + bytes(info)

    # frame header: sync(14)=0x3FFE, reserved 0, fixed blocksize(0),
    # bs_code=7 (16-bit at end), sr_code=7? use code for custom: 0b1101 (sr in
    # 16 bits Hz)... use sr_code=0b0111 (24 kHz is table entry 7)
    hdr = BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)  # reserved
    hdr.write(0, 1)  # fixed blocksize
    hdr.write(7, 4)  # blocksize: 16-bit value - 1 at end of header
    hdr.write(7, 4)  # sample rate: table index 7 = 24000
    hdr.write(0, 4)  # channels: 1 (independent)
    hdr.write(0b100, 3)  # bps: 16
    hdr.write(0, 1)  # reserved
    hdr.write(0, 8)  # frame number 0 (utf8, 1 byte)
    hdr.write(n - 1, 16)  # blocksize-1
    header_bytes = hdr.bytes()
    out += header_bytes
    out += bytes([crc8(header_bytes)])

    body = BitWriter()
    body.write(0, 1)  # subframe padding bit
    body.write(1, 6)  # type: verbatim
    body.write(0, 1)  # no wasted bits
    for s in samples_int16:
        body.write(int(s) & 0xFFFF, 16)
    body.align()
    out += body.bytes()
    out += b"\x00\x00"  # frame CRC-16 (decoder skips it)
    return bytes(out)


# ------------------------------- tests --------------------------------- #


def test_wav_16bit_roundtrip(tmp_path):
    audio = sine()
    path = tmp_path / "a.wav"
    write_wav16(path, audio)
    out, sr = audioio.load(str(path))
    assert sr == SR
    assert len(out) == len(audio)
    assert np.abs(out - audio).max() < 1e-3


def test_wav_stereo_downmix(tmp_path):
    audio = sine()
    path = tmp_path / "st.wav"
    write_wav16(path, audio, channels=2)
    out, sr = audioio.load(str(path))
    assert np.abs(out - audio).max() < 1e-3


def test_wav_8bit(tmp_path):
    audio = sine()
    pcm = ((np.clip(audio, -1, 1) * 127) + 128).astype(np.uint8)
    path = tmp_path / "b.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())
    out, sr = audioio.load(str(path))
    assert np.abs(out - audio).max() < 2e-2


def test_flac_verbatim_roundtrip(tmp_path):
    audio = sine(seconds=0.05)
    pcm = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    path = tmp_path / "c.flac"
    path.write_bytes(encode_flac_verbatim(pcm))
    out, sr = audioio.load(str(path))
    assert sr == SR
    assert len(out) == len(pcm)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_resample_preserves_tone():
    audio = sine(freq=440.0, seconds=1.0)
    out = audioio.resample(audio, SR, 16000)
    assert len(out) == 16000
    t = np.arange(len(out)) / 16000
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    assert np.abs(out[200:-200] - ref[200:-200]).max() < 1e-3


def test_resample_antialias():
    # a tone above the target nyquist must be strongly attenuated
    audio = sine(freq=11000.0, seconds=0.5)  # > 8000/2 after 24k→16k? no: 11k > 8k
    out = audioio.resample(audio, SR, 16000)
    assert np.abs(out[100:-100]).max() < 0.1


def test_dataset_uses_native_loader(tmp_path):
    from naturalspeech2_tpu.data import load_audio

    audio = sine()
    path = tmp_path / "d.wav"
    write_wav16(path, audio)
    out, sr = load_audio(str(path))
    assert sr == SR and len(out) == len(audio)


@pytest.mark.slow
def test_flac_corrupt_no_crash(tmp_path):
    """Corrupt FLAC bytes with embedded 0xFFF8 sync pairs must be rejected
    (or decoded partially), never crash/overflow (ADVICE r1: decode_residual
    size_t underflow wrote ~2^64 entries past the block buffer)."""
    import random as _random

    rng = _random.Random(0)
    audioio = pytest.importorskip("naturalspeech2_tpu.native.audioio")
    for trial in range(200):
        n = rng.randint(50, 400)
        body = bytes(rng.randrange(256) for _ in range(n))
        # force plenty of frame-sync candidates and a STREAMINFO-ish header
        data = b"fLaC" + bytes([0x80, 0, 0, 34]) + body
        data = data.replace(b"\x00\x00", b"\xff\xf8")
        p = tmp_path / f"fuzz{trial}.flac"
        p.write_bytes(data)
        try:
            audio, sr = audioio.load(str(p))
            assert np.all(np.isfinite(audio))
        except Exception:
            pass  # rejection is fine; crashing the process is not


def test_flac_truncated_streaminfo(tmp_path):
    audioio = pytest.importorskip("naturalspeech2_tpu.native.audioio")
    p = tmp_path / "trunc.flac"
    p.write_bytes(b"fLaC" + bytes([0x80, 0, 0, 34]) + b"\x01" * 40)
    try:
        audioio.load(str(p))
    except Exception:
        pass
