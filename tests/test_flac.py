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


# ---------------------------------------------------------------------------
# Robustness: corrupt / hostile input must fail cleanly, never crash.
#
# The decoder runs in-process via ctypes inside long-lived training and
# serving processes, so a malformed file (truncated download, bit rot, or
# adversarial content) must surface as ValueError from read_flac — a segfault
# or std::bad_alloc abort would take the whole process down. These tests
# exercise the guards in native/seio.cpp:decode_flac_impl.
# ---------------------------------------------------------------------------


def assert_rejects(data, tmp_path, name):
    with pytest.raises(ValueError):
        decode(data, tmp_path, name)


def test_corrupt_not_flac(lib_available, tmp_path):
    assert_rejects(b"RIFF" + b"\x00" * 100, tmp_path, "notflac.flac")
    assert_rejects(b"fLaC", tmp_path, "tiny.flac")


def test_corrupt_metadata_length_overruns_file(lib_available, tmp_path):
    # metadata block claims a length far past EOF
    data = b"fLaC" + bytes([0x00]) + (0xFFFFFF).to_bytes(3, "big") + b"\x00" * 8
    assert_rejects(data, tmp_path, "metaover.flac")


def test_corrupt_streaminfo_zero_rate(lib_available, tmp_path):
    data = streaminfo(0, 1, 16, 4096)
    assert_rejects(data + b"\x00" * 16, tmp_path, "zerorate.flac")


def test_corrupt_wasted_bits_exceed_bps(lib_available, tmp_path):
    # subframe claims >= bps wasted bits: the sample shift would be UB
    samples = np.zeros(4096, dtype=np.int64)
    bw = BitWriter()
    bw.write(0, 1)        # padding
    bw.write(0, 6)        # constant subframe
    bw.write(1, 1)        # wasted-bits flag set
    bw.write_unary(20)    # wasted = 21 > bps 16
    bw.write(0, 16)
    data = streaminfo(16000, 1, 16, 4096)
    data += frame_header(0b1100, 0) + bw.bytes() + b"\x00\x00"
    assert_rejects(data, tmp_path, "wasted.flac")


def test_corrupt_stereo_mode_on_mono_stream(lib_available, tmp_path):
    # left/side channel mode inside a stream whose STREAMINFO says mono:
    # decorrelation indexes subs[1], which is not provisioned
    samples = np.zeros(16, dtype=np.int64)
    body = encode_verbatim_bits(samples, 16)
    data = (
        streaminfo(16000, 1, 16, 16)
        + _stereo_frame_header(8)      # left/side on a mono stream
        + body.bytes()
        + b"\x00\x00"
    )
    assert_rejects(data, tmp_path, "monoside.flac")


def test_corrupt_giant_total_samples_no_alloc_abort(lib_available, tmp_path):
    # lying STREAMINFO total_samples (2^36-1) must not pre-reserve ~256 GB
    samples = np.full(4096, 42, dtype=np.int64)
    data = streaminfo(16000, 1, 16, (1 << 36) - 1)
    data += frame_header(0b1100, 0) + encode_constant(42).bytes() + b"\x00\x00"
    wav, sr = decode(data, tmp_path, "gianttotal.flac")
    # decodes what's actually present and stops at EOF
    assert wav.shape == (1, 4096)
    np.testing.assert_allclose(wav[0], 42 / 32768.0, atol=1e-7)


def test_corrupt_truncated_mid_frame(lib_available, tmp_path):
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32767, size=4096, dtype=np.int64)
    data = build_flac(encode_verbatim(samples), samples)
    truncated = data[: len(data) // 2]
    # either a clean reject or a shorter decode is acceptable; no crash
    try:
        wav, _ = decode(truncated, tmp_path, "trunc.flac")
        assert wav.shape[1] <= 4096
    except ValueError:
        pass


def test_fuzz_random_mutations_never_crash(lib_available, tmp_path):
    """200 random single/multi-byte mutations of a valid stream."""
    rng = np.random.default_rng(11)
    samples = np.cumsum(rng.integers(-7, 8, size=4096)).astype(np.int64)
    base = bytearray(build_flac(encode_fixed1_rice(samples), samples))
    for trial in range(200):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 8))):
            pos = int(rng.integers(0, len(data)))
            data[pos] = int(rng.integers(0, 256))
        try:
            decode(bytes(data), tmp_path, f"fz{trial}.flac")
        except ValueError:
            pass


def test_fuzz_random_garbage_never_crashes(lib_available, tmp_path):
    rng = np.random.default_rng(13)
    for trial in range(50):
        n = int(rng.integers(4, 4096))
        data = b"fLaC" + rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        try:
            decode(data, tmp_path, f"gb{trial}.flac")
        except ValueError:
            pass


def encode_lpc_rice(samples, coeffs, shift, precision=15, rice_param=6):
    """General LPC subframe: x[i] = res + ((sum coeffs[j]*x[i-1-j]) >> shift).
    coeffs[0] multiplies the most recent sample (FLAC convention)."""
    order = len(coeffs)
    bw = BitWriter()
    bw.write(0, 1)
    bw.write(32 + (order - 1), 6)
    bw.write(0, 1)
    for i in range(order):
        bw.write(int(samples[i]) & 0xFFFF, 16)
    bw.write(precision - 1, 4)
    bw.write(shift, 5)
    mask = (1 << precision) - 1
    for c in coeffs:
        bw.write(int(c) & mask, precision)
    bw.write(0, 2)            # rice method 0
    bw.write(0, 4)            # partition order 0
    bw.write(rice_param, 4)
    for i in range(order, len(samples)):
        pred = sum(int(coeffs[j]) * int(samples[i - 1 - j])
                   for j in range(order)) >> shift
        res = int(samples[i]) - pred
        zz = (res << 1) if res >= 0 else ((-res) << 1) - 1
        q, r = zz >> rice_param, zz & ((1 << rice_param) - 1)
        bw.write_unary(q)
        bw.write(r, rice_param)
    return bw


def test_lpc_order8_subframe(lib_available, tmp_path):
    """Order-8 LPC (the order real LibriSpeech FLAC typically uses)."""
    rng = np.random.default_rng(9)
    samples = np.cumsum(rng.integers(-25, 26, size=4096)).astype(np.int64)
    # a mildly smoothing stable predictor, quantized at shift 6
    coeffs = [90, -30, 20, -12, 8, -5, 3, -2]
    data = build_flac(encode_lpc_rice(samples, coeffs, 6), samples)
    wav, sr = decode(data, tmp_path, "lpc8.flac")
    np.testing.assert_allclose(wav[0], samples / 32768.0, atol=1e-7)


def test_lpc_order12_subframe(lib_available, tmp_path):
    rng = np.random.default_rng(10)
    samples = np.cumsum(rng.integers(-25, 26, size=4096)).astype(np.int64)
    coeffs = [70, -25, 15, -10, 7, -5, 4, -3, 2, -2, 1, -1]
    data = build_flac(encode_lpc_rice(samples, coeffs, 6), samples)
    wav, sr = decode(data, tmp_path, "lpc12.flac")
    np.testing.assert_allclose(wav[0], samples / 32768.0, atol=1e-7)
