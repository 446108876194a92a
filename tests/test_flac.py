"""Native FLAC decoder tests.

No FLAC encoder exists in this image, so these tests hand-assemble valid
FLAC bitstreams (STREAMINFO + frames with verbatim / constant / fixed-
order-1 rice-coded subframes) and check the native decoder reproduces the
samples exactly.
"""
import struct

import numpy as np
import pytest


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_unary(self, q: int):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def streaminfo(sample_rate, channels, bps, total):
    bw = BitWriter()
    bw.write(4096, 16)  # min block
    bw.write(4096, 16)  # max block
    bw.write(0, 24)     # min frame size
    bw.write(0, 24)     # max frame size
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total, 36)
    body = bw.bytes() + b"\x00" * 16  # md5 zeros
    head = bytes([0x80]) + len(body).to_bytes(3, "big")  # last block, type 0
    return b"fLaC" + head + body


def frame_header(block_size_code, frame_idx, extra_bytes=b""):
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocksize strategy
    bw.write(block_size_code, 4)
    bw.write(0b0101, 4)   # 16 kHz from table
    bw.write(0, 4)        # 1 channel, independent
    bw.write(0b100, 3)    # 16 bps
    bw.write(0, 1)        # reserved
    out = bw.bytes()
    assert frame_idx < 0x80
    out += bytes([frame_idx])  # utf8 frame number (small)
    out += extra_bytes
    out += b"\x00"  # crc8 (unverified)
    return out


def encode_verbatim(samples):
    bw = BitWriter()
    bw.write(0, 1)          # padding
    bw.write(1, 6)          # verbatim
    bw.write(0, 1)          # no wasted bits
    for s in samples:
        bw.write(int(s) & 0xFFFF, 16)
    return bw

def encode_constant(value):
    bw = BitWriter()
    bw.write(0, 1)
    bw.write(0, 6)          # constant
    bw.write(0, 1)
    bw.write(int(value) & 0xFFFF, 16)
    return bw


def encode_fixed1_rice(samples, rice_param=4):
    """Fixed predictor order 1 with one rice partition."""
    bw = BitWriter()
    bw.write(0, 1)
    bw.write(8 + 1, 6)      # fixed, order 1
    bw.write(0, 1)
    bw.write(int(samples[0]) & 0xFFFF, 16)  # warmup
    bw.write(0, 2)          # residual method 0 (4-bit rice)
    bw.write(0, 4)          # partition order 0
    bw.write(rice_param, 4)
    for i in range(1, len(samples)):
        res = int(samples[i]) - int(samples[i - 1])
        zz = (res << 1) ^ (res >> 63) if res >= 0 else ((-res) << 1) - 1
        zz = (res << 1) if res >= 0 else ((-res) << 1) - 1
        q, r = zz >> rice_param, zz & ((1 << rice_param) - 1)
        bw.write_unary(q)
        bw.write(r, rice_param)
    return bw


def build_flac(subframe_writer, samples, block_size_code=0b1100):
    """One-frame mono 16 kHz 16-bit FLAC stream (4096-sample block)."""
    data = streaminfo(16000, 1, 16, len(samples))
    body = subframe_writer.bytes()
    data += frame_header(block_size_code, 0) + body + b"\x00\x00"  # crc16
    return data


@pytest.fixture(scope="module")
def lib_available():
    from speech_enhancement_by_s3prl_tpu.data.flac import _load_library

    try:
        _load_library()
    except Exception as e:  # toolchain missing
        pytest.skip(f"native decoder unavailable: {e}")


def decode(data, tmp_path, name):
    from speech_enhancement_by_s3prl_tpu.data.flac import read_flac

    p = tmp_path / name
    p.write_bytes(data)
    return read_flac(str(p))


def test_verbatim_frame(lib_available, tmp_path):
    rng = np.random.default_rng(0)
    samples = rng.integers(-32768, 32767, size=4096, dtype=np.int64)
    data = build_flac(encode_verbatim(samples), samples)
    wav, sr = decode(data, tmp_path, "v.flac")
    assert sr == 16000 and wav.shape == (1, 4096)
    np.testing.assert_allclose(wav[0], samples / 32768.0, atol=1e-7)


def test_constant_frame(lib_available, tmp_path):
    samples = np.full(4096, -1234, dtype=np.int64)
    data = build_flac(encode_constant(-1234), samples)
    wav, sr = decode(data, tmp_path, "c.flac")
    np.testing.assert_allclose(wav[0], samples / 32768.0, atol=1e-7)


def test_fixed_order1_rice_frame(lib_available, tmp_path):
    rng = np.random.default_rng(1)
    # smooth ramp + noise: small first differences, rice-friendly
    samples = np.cumsum(rng.integers(-7, 8, size=4096)).astype(np.int64)
    data = build_flac(encode_fixed1_rice(samples), samples)
    wav, sr = decode(data, tmp_path, "f.flac")
    np.testing.assert_allclose(wav[0], samples / 32768.0, atol=1e-7)


def test_load_audio_dispatches_flac(lib_available, tmp_path):
    from speech_enhancement_by_s3prl_tpu.data.audio_io import load_audio

    samples = np.full(4096, 1000, dtype=np.int64)
    p = tmp_path / "d.flac"
    p.write_bytes(build_flac(encode_constant(1000), samples))
    wav, sr = load_audio(str(p), sr=16000)
    assert sr == 16000 and wav.shape == (4096,)
    np.testing.assert_allclose(wav, 1000 / 32768.0, atol=1e-6)


def encode_lpc1_rice(samples, coeff, shift, rice_param=6):
    """LPC order 1: x[i] = residual + ((coeff * x[i-1]) >> shift)."""
    bw = BitWriter()
    bw.write(0, 1)
    bw.write(32 + 0, 6)       # lpc, order 1 (type 100000 | (order-1))
    bw.write(0, 1)
    bw.write(int(samples[0]) & 0xFFFF, 16)   # warmup
    bw.write(15 - 1, 4)       # precision code: precision 15
    bw.write(shift, 5)        # shift (signed 5-bit, positive here)
    bw.write(coeff & 0x7FFF, 15)             # coefficient
    bw.write(0, 2)            # rice method 0
    bw.write(0, 4)            # partition order 0
    bw.write(rice_param, 4)
    for i in range(1, len(samples)):
        pred = (coeff * int(samples[i - 1])) >> shift
        res = int(samples[i]) - pred
        zz = (res << 1) if res >= 0 else ((-res) << 1) - 1
        q, r = zz >> rice_param, zz & ((1 << rice_param) - 1)
        bw.write_unary(q)
        bw.write(r, rice_param)
    return bw


def test_lpc_subframe(lib_available, tmp_path):
    rng = np.random.default_rng(5)
    samples = np.cumsum(rng.integers(-15, 16, size=4096)).astype(np.int64)
    coeff, shift = 31, 5  # predictor ~0.97 * x[i-1]
    data = build_flac(encode_lpc1_rice(samples, coeff, shift), samples)
    wav, sr = decode(data, tmp_path, "lpc.flac")
    np.testing.assert_allclose(wav[0], samples / 32768.0, atol=1e-7)


def _stereo_streaminfo(total):
    return streaminfo(16000, 2, 16, total)


def _stereo_frame_header(ch_code, frame_idx=0):
    bw = BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0b1100, 4)    # 4096 block
    bw.write(0b0101, 4)    # 16 kHz
    bw.write(ch_code, 4)   # 8=left/side 9=right/side 10=mid/side
    bw.write(0b100, 3)     # 16 bps
    bw.write(0, 1)
    out = bw.bytes() + bytes([frame_idx]) + b"\x00"
    return out


def encode_verbatim_bits(samples, bits):
    bw = BitWriter()
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    mask = (1 << bits) - 1
    for s in samples:
        bw.write(int(s) & mask, bits)
    return bw


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_stereo_decorrelation(lib_available, tmp_path, mode):
    rng = np.random.default_rng(7)
    left = rng.integers(-20000, 20000, size=4096).astype(np.int64)
    right = rng.integers(-20000, 20000, size=4096).astype(np.int64)
    side = left - right
    if mode == "left_side":
        ch_code, sub0, sub1 = 8, (left, 16), (side, 17)
    elif mode == "right_side":
        ch_code, sub0, sub1 = 9, (side, 17), (right, 16)
    else:
        mid = (left + right) >> 1
        ch_code, sub0, sub1 = 10, (mid, 16), (side, 17)

    body = encode_verbatim_bits(*sub0).bytes() if False else None
    bw = BitWriter()
    for samples, bits in (sub0, sub1):
        sub = encode_verbatim_bits(samples, bits)
        bw.bits.extend(sub.bits)
    data = (
        _stereo_streaminfo(4096)
        + _stereo_frame_header(ch_code)
        + bw.bytes()
        + b"\x00\x00"
    )
    wav, sr = decode(data, tmp_path, f"{mode}.flac")
    assert wav.shape == (2, 4096)
    np.testing.assert_allclose(wav[0], left / 32768.0, atol=1e-7)
    np.testing.assert_allclose(wav[1], right / 32768.0, atol=1e-7)
