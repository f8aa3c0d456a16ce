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


# --------------------- mp3/ogg container coverage ----------------------- #
# The reference's SoundDataset accepts whatever torchaudio decodes (mp3/ogg
# included); audio_load now routes those to dlopen'd system codecs
# (libmpg123/libvorbisfile). Test fixtures are encoded with the system's
# lame/vorbis encoders via ctypes — no Python audio packages involved.

import ctypes

import pytest


def _encode_mp3(path, audio, sr):
    lame = ctypes.CDLL("libmp3lame.so.0")
    lame.lame_init.restype = ctypes.c_void_p
    gfp = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gfp, sr)
    lame.lame_set_num_channels(gfp, 1)
    lame.lame_set_mode(gfp, 3)  # MONO
    lame.lame_set_brate(gfp, 64)
    assert lame.lame_init_params(gfp) >= 0
    n = len(audio)
    out = (ctypes.c_ubyte * (n * 5 // 4 + 7200))()
    pcm = (ctypes.c_float * n)(*audio.tolist())
    # lame float API expects +/-32768 scale
    scaled = (ctypes.c_float * n)(*(audio * 32767.0).tolist())
    m = lame.lame_encode_buffer_ieee_float(
        gfp, scaled, scaled, n, out, len(out)
    )
    assert m >= 0, m
    m2 = lame.lame_encode_flush(gfp, ctypes.byref(out, m), len(out) - m)
    assert m2 >= 0
    with open(path, "wb") as f:
        f.write(bytes(out[: m + m2]))
    lame.lame_close(gfp)


def _tone(sr=24000, seconds=0.5, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.6 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mp3_decode_roundtrip(tmp_path):
    try:
        ctypes.CDLL("libmp3lame.so.0")
        ctypes.CDLL("libmpg123.so.0")
    except OSError:
        pytest.skip("system mp3 codecs not present")
    from naturalspeech2_tpu.native import audioio

    sr = 24000
    tone = _tone(sr)
    p = tmp_path / "tone.mp3"
    _encode_mp3(str(p), tone, sr)
    audio, got_sr = audioio.load(str(p))
    assert got_sr == sr
    # mp3 adds encoder/decoder delay padding; compare length loosely and
    # the dominant frequency exactly
    assert abs(len(audio) - len(tone)) < 4000, (len(audio), len(tone))
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    peak_hz = np.argmax(spec) * got_sr / len(audio)
    assert abs(peak_hz - 440.0) < 10.0, peak_hz
    assert np.abs(audio).max() < 1.5


def test_mp3_through_sound_dataset(tmp_path):
    try:
        ctypes.CDLL("libmp3lame.so.0")
        ctypes.CDLL("libmpg123.so.0")
    except OSError:
        pytest.skip("system mp3 codecs not present")
    from naturalspeech2_tpu.data import SoundDataset

    sr = 24000
    _encode_mp3(str(tmp_path / "a.mp3"), _tone(sr), sr)
    _encode_mp3(str(tmp_path / "b.mp3"), _tone(sr, freq=220.0), sr)
    ds = SoundDataset(str(tmp_path), max_length=3200, target_sample_hz=sr,
                      seq_len_multiple_of=320)
    assert len(ds.paths) == 2
    x = ds[0]
    assert x.shape == (3200,) and np.isfinite(x).all() and np.abs(x).max() > 0.05


def test_corrupt_mp3_errors_not_silence(tmp_path):
    from naturalspeech2_tpu.native import audioio

    p = tmp_path / "junk.mp3"
    p.write_bytes(b"ID3" + b"\x00" * 64)
    with pytest.raises(Exception):
        audioio.load(str(p))


class _OggPage(ctypes.Structure):
    _fields_ = [("header", ctypes.POINTER(ctypes.c_ubyte)),
                ("header_len", ctypes.c_long),
                ("body", ctypes.POINTER(ctypes.c_ubyte)),
                ("body_len", ctypes.c_long)]


class _OggPacket(ctypes.Structure):
    _fields_ = [("packet", ctypes.POINTER(ctypes.c_ubyte)),
                ("bytes", ctypes.c_long), ("b_o_s", ctypes.c_long),
                ("e_o_s", ctypes.c_long), ("granulepos", ctypes.c_int64),
                ("packetno", ctypes.c_int64)]


def _encode_ogg(path, audio, sr):
    """Minimal Ogg/Vorbis encoder over the system libs (test fixture only)."""
    ogg = ctypes.CDLL("libogg.so.0")
    vorbis = ctypes.CDLL("libvorbis.so.0")
    venc = ctypes.CDLL("libvorbisenc.so.2")
    venc.vorbis_encode_init_vbr.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_float,
    ]
    vorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float)
    )
    vi = ctypes.create_string_buffer(4096)
    vorbis.vorbis_info_init(vi)
    assert venc.vorbis_encode_init_vbr(vi, 1, sr, 0.4) == 0
    vc = ctypes.create_string_buffer(4096)
    vorbis.vorbis_comment_init(vc)
    vd = ctypes.create_string_buffer(16384)
    assert vorbis.vorbis_analysis_init(vd, vi) == 0
    vb = ctypes.create_string_buffer(16384)
    assert vorbis.vorbis_block_init(vd, vb) == 0
    os_ = ctypes.create_string_buffer(4096)
    assert ogg.ogg_stream_init(os_, 1) == 0

    out = bytearray()
    og = _OggPage()

    def drain(flush):
        fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
        while fn(os_, ctypes.byref(og)):
            out.extend(ctypes.string_at(og.header, og.header_len))
            out.extend(ctypes.string_at(og.body, og.body_len))

    h1, h2, h3 = _OggPacket(), _OggPacket(), _OggPacket()
    assert vorbis.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(h1), ctypes.byref(h2), ctypes.byref(h3)
    ) == 0
    for h in (h1, h2, h3):
        ogg.ogg_stream_packetin(os_, ctypes.byref(h))
    drain(flush=True)

    n = len(audio)
    buf = vorbis.vorbis_analysis_buffer(vd, n)
    for i, v in enumerate(audio):
        buf[0][i] = float(v)
    vorbis.vorbis_analysis_wrote(vd, n)
    vorbis.vorbis_analysis_wrote(vd, 0)  # EOS
    op = _OggPacket()
    while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
        vorbis.vorbis_analysis(vb, None)
        vorbis.vorbis_bitrate_addblock(vb)
        while vorbis.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
            ogg.ogg_stream_packetin(os_, ctypes.byref(op))
            drain(flush=False)
    drain(flush=True)
    with open(path, "wb") as f:
        f.write(bytes(out))


def test_ogg_decode_roundtrip(tmp_path):
    try:
        ctypes.CDLL("libvorbisenc.so.2")
        ctypes.CDLL("libvorbisfile.so.3")
    except OSError:
        pytest.skip("system vorbis codecs not present")
    from naturalspeech2_tpu.native import audioio

    sr = 24000
    tone = _tone(sr)
    p = tmp_path / "tone.ogg"
    _encode_ogg(str(p), tone, sr)
    assert p.stat().st_size > 1000
    audio, got_sr = audioio.load(str(p))
    assert got_sr == sr
    assert abs(len(audio) - len(tone)) < 2000, (len(audio), len(tone))
    spec = np.abs(np.fft.rfft(audio * np.hanning(len(audio))))
    peak_hz = np.argmax(spec) * got_sr / len(audio)
    assert abs(peak_hz - 440.0) < 10.0, peak_hz
