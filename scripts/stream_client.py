#!/usr/bin/env python
"""Reference client for serve.py's live POST /stream endpoint.

Reads a WAV/FLAC file, feeds it to the server as chunked float32 PCM —
optionally paced at real time, simulating a live microphone — and writes
the enhanced stream to a WAV as chunks arrive. Full duplex on one raw
socket: enhanced audio is drained WHILE the request body is still being
sent (an http.client request() would buffer-deadlock on long realtime
streams), and the wall-clock lag between pushing a sample and receiving
its enhanced version is reported (the StatefulStreamer's algorithmic
latency of ``(2*delta) frames + one chunk`` plus network/compute).

  python serve.py --ckpt result/uni --port 8080        # unidirectional head
  python scripts/stream_client.py noisy.wav enhanced.wav \
      --url http://localhost:8080/stream --realtime

The server answers 400 with the reason when the served checkpoint cannot
stream (bidirectional head, upstream/waveform features, artifact serving).
"""
import argparse
import os
import select
import socket
import sys
import time
import urllib.parse

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _ChunkedResponse:
    """Incremental parser: HTTP status line + headers, then chunked body."""

    def __init__(self):
        self.buf = b""
        self.status = None
        self.header = b""
        self.body = b""
        self.done = False
        self._need = None  # bytes remaining in the current chunk (+CRLF)

    def feed(self, data: bytes):
        self.buf += data
        if self.status is None:
            if b"\r\n\r\n" not in self.buf:
                return
            self.header, self.buf = self.buf.split(b"\r\n\r\n", 1)
            self.status = int(self.header.split(b" ", 2)[1])
        while self.buf and not self.done:
            if self._need is not None:
                take = min(self._need, len(self.buf))
                # chunk CRLF rides along; trimmed when the chunk completes
                self.body += self.buf[:take]
                self.buf = self.buf[take:]
                self._need -= take
                if self._need == 0:
                    self.body = self.body[:-2]  # strip chunk CRLF
                    self._need = None
                continue
            if b"\r\n" not in self.buf:
                return
            line, self.buf = self.buf.split(b"\r\n", 1)
            size = int(line.split(b";")[0].strip() or b"0", 16)
            if size == 0:
                self.done = True
                return
            self._need = size + 2  # chunk data + trailing CRLF


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("infile", help="WAV/FLAC to enhance")
    ap.add_argument("outfile", help="enhanced WAV destination")
    ap.add_argument("--url", default="http://127.0.0.1:8080/stream")
    ap.add_argument("--sample_rate", type=int, default=16000,
                    help="server PCM rate (input is resampled to it)")
    ap.add_argument("--chunk_ms", type=float, default=100.0,
                    help="PCM pushed per request chunk")
    ap.add_argument("--realtime", action="store_true",
                    help="pace chunks at real time (live-microphone "
                         "simulation) instead of as fast as possible")
    args = ap.parse_args()

    from speech_enhancement_by_s3prl_tpu.data.audio_io import (
        read_audio,
        resample_poly,
        write_wav,
    )

    wav, sr = read_audio(args.infile)
    wav = wav.mean(0) if wav.shape[0] > 1 else wav[0]
    if sr != args.sample_rate:
        wav = resample_poly(wav, sr, args.sample_rate)
    wav = np.asarray(wav, np.float32)
    sr = args.sample_rate
    hop = max(1, int(sr * args.chunk_ms / 1000.0))

    u = urllib.parse.urlparse(args.url)
    s = socket.create_connection((u.hostname, u.port or 80), timeout=600)
    s.sendall(
        f"POST {u.path or '/stream'} HTTP/1.1\r\n"
        f"Host: {u.hostname}:{u.port or 80}\r\n"
        "Content-Type: application/octet-stream\r\n"
        "Transfer-Encoding: chunked\r\n\r\n".encode()
    )

    resp = _ChunkedResponse()
    push_t = []  # (cumulative samples sent, wall time the send finished)
    lag_max, t_first = 0.0, None
    t0 = time.monotonic()

    def drain(block=False):
        nonlocal lag_max, t_first
        while True:
            r, _, _ = select.select([s], [], [], None if block else 0.0)
            if not r:
                return True
            data = s.recv(65536)
            if not data:
                return False
            before = len(resp.body)
            resp.feed(data)
            if resp.status is not None and resp.status != 200:
                drain(block=True)  # collect the error body
                sys.stderr.write(
                    f"[stream] HTTP {resp.status}: "
                    f"{resp.body.decode(errors='replace')}\n"
                )
                sys.exit(2)
            if len(resp.body) > before:
                now = time.monotonic()
                if t_first is None:
                    t_first = now
                got = len(resp.body) // 4
                # a push's latency: send-completion -> its LAST sample
                # arriving back enhanced
                while push_t and push_t[0][0] <= got:
                    lag_max = max(lag_max, now - push_t.pop(0)[1])
            if resp.done:
                return False
            if block:
                return True

    for k in range(0, len(wav), hop):
        piece = wav[k : k + hop].astype("<f4").tobytes()
        if args.realtime:
            target = t0 + k / sr
            while (left := target - time.monotonic()) > 0:
                r, _, _ = select.select([s], [], [], left)
                if r:
                    drain()
                else:
                    break
        s.sendall(f"{len(piece):x}\r\n".encode() + piece + b"\r\n")
        push_t.append((min(k + hop, len(wav)), time.monotonic()))
        drain()
    s.sendall(b"0\r\n\r\n")
    while not resp.done:
        if not drain(block=True):
            break
    s.close()

    out = np.frombuffer(resp.body, "<f4")
    write_wav(args.outfile, out, sr)
    dur = len(wav) / sr
    wall = time.monotonic() - t0
    print(
        f"[stream] {dur:.2f}s audio in {wall:.2f}s wall "
        f"({dur / max(wall, 1e-9):.1f}x realtime), {len(out)} samples out, "
        f"first audio after {(t_first or wall) - t0 + 0.0:.3f}s, "
        f"max push->enhanced lag {lag_max * 1000.0:.1f} ms"
    )


if __name__ == "__main__":
    main()
