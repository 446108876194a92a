"""serve.py POST /stream: live chunked-PCM enhancement over HTTP via the
StatefulStreamer — byte parity with the streamer driven directly, output
arriving before the request finishes (the constant-latency property), and
a clear 400 for configurations streaming cannot serve."""
import argparse
import http.client
import os
import socket
import sys
import threading
import time

import numpy as np
import pytest

import jax

from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.ops.streaming import StatefulStreamer
from speech_enhancement_by_s3prl_tpu.runner.checkpoint import save_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL_CFG = dict(hidden_size=16, num_layers=2, bidirectional=False,
                 activation="Sigmoid", cmvn=False)


def _make_ckpt(tmp, bidirectional=False):
    """A from_rawfeature checkpoint exactly as serve.build_raw_enhancer
    reconstructs it: mel+log+delta downstream features, CMVN-free."""
    baseline = get_feat_config("mel", 0, log=True, delta=2, cmvn=False)
    cfg = dict(MODEL_CFG, bidirectional=bidirectional)
    config = {
        "preprocessor": {"input_channel": 0, "target_channel": 1,
                         "baseline": dict(baseline)},
        "model": {"Residual": cfg},
    }
    paras = {"downstream": "Residual", "from_rawfeature": True,
             "upstream": "transformer", "ckpt": "", "dckpt": ""}

    feat_list = [
        dict(baseline), dict(baseline),
        get_feat_config("linear", 0), get_feat_config("uphase", 0),
        get_feat_config("linear", 0), get_feat_config("uphase", 0),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    dims = pre.feat_dims()
    model = build_head("Residual", input_size=dims[1], output_size=dims[2],
                       **cfg)
    import jax.numpy as jnp

    feats = pre(jnp.zeros((1, 1, 16000), jnp.float32))
    params = model.init(jax.random.PRNGKey(0), features=feats[1],
                        linears=feats[2])
    save_checkpoint(str(tmp), 1, params, {}, config, paras)
    return pre, model, params


def _start_server(ckpt_dir):
    """Run serve.main in a thread (the test_serve.py pattern) and return
    the live HTTPServer."""
    sys.path.insert(0, REPO)
    import serve
    from http.server import HTTPServer

    class Args(argparse.Namespace):
        ckpt = str(ckpt_dir)
        host = "127.0.0.1"
        port = 0
        sample_rate = 16000
        target_level = -25.0
        cpu = True

    holder = {}
    real_parse = argparse.ArgumentParser.parse_args
    real_serve = HTTPServer.serve_forever

    def fake_parse(self, *a, **k):
        return Args()

    def capture_serve(self):
        holder["server"] = self
        real_serve(self)

    argparse.ArgumentParser.parse_args = fake_parse
    HTTPServer.serve_forever = capture_serve
    try:
        t = threading.Thread(target=serve.main, daemon=True)
        t.start()
        for _ in range(600):
            if "server" in holder:
                break
            time.sleep(0.5)
    finally:
        argparse.ArgumentParser.parse_args = real_parse
        HTTPServer.serve_forever = real_serve
    assert "server" in holder, "server did not start"
    return holder["server"]


@pytest.fixture(scope="module")
def stream_server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream_ckpt")
    pre, model, params = _make_ckpt(tmp)
    server = _start_server(tmp)
    yield server, pre, model, params
    server.shutdown()


def _test_wav(n=16000 * 2 + 333, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_stream_endpoint_matches_streamer_exactly(stream_server):
    """HTTP plumbing adds nothing: the /stream response is byte-identical
    to driving a StatefulStreamer directly (same code path; raw float32
    survives the round trip exactly). Request chunks are deliberately NOT
    float32-aligned to exercise the remainder buffering."""
    server, pre, model, params = stream_server
    wav = _test_wav()

    ref_streamer = StatefulStreamer(
        params, model, pre, feat_cfg=pre.feat_list[1], frames_per_chunk=48
    )
    ref = np.concatenate([ref_streamer.push(wav), ref_streamer.flush()])

    raw = wav.astype("<f4").tobytes()
    cuts = list(range(0, len(raw), 7001)) + [len(raw)]  # odd-sized chunks
    pieces = [raw[a:b] for a, b in zip(cuts, cuts[1:])]

    host, port = server.server_address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/stream", body=iter(pieces),
                 headers={"Content-Type": "application/octet-stream"},
                 encode_chunked=True)
    resp = conn.getresponse()
    assert resp.status == 200
    got = np.frombuffer(resp.read(), "<f4")
    conn.close()

    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_stream_fixed_length_body(stream_server):
    """A plain Content-Length body streams too (the response is still
    chunked and identical to the chunked-request path)."""
    server, pre, model, params = stream_server
    wav = _test_wav(16000, seed=1)

    ref_streamer = StatefulStreamer(
        params, model, pre, feat_cfg=pre.feat_list[1], frames_per_chunk=48
    )
    ref = np.concatenate([ref_streamer.push(wav), ref_streamer.flush()])

    host, port = server.server_address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/stream", body=wav.astype("<f4").tobytes(),
                 headers={"Content-Type": "application/octet-stream"})
    resp = conn.getresponse()
    assert resp.status == 200
    got = np.frombuffer(resp.read(), "<f4")
    conn.close()
    np.testing.assert_array_equal(got, ref)


def test_stream_emits_before_request_completes(stream_server):
    """Constant latency over the wire: enhanced audio arrives while the
    request body is still open — not one burst after the final chunk."""
    server, *_ = stream_server
    host, port = server.server_address
    wav = _test_wav(16000 * 2, seed=2)
    raw = wav.astype("<f4").tobytes()

    s = socket.create_connection((host, port), timeout=120)
    try:
        s.sendall(
            b"POST /stream HTTP/1.1\r\n"
            + f"Host: {host}:{port}\r\n".encode()
            + b"Transfer-Encoding: chunked\r\n\r\n"
        )
        # feed 2 s of audio in 4 chunks, terminal chunk NOT sent yet
        quarter = len(raw) // 4
        for k in range(4):
            piece = raw[k * quarter:(k + 1) * quarter]
            s.sendall(f"{len(piece):x}\r\n".encode() + piece + b"\r\n")
        s.settimeout(60)
        early = s.recv(65536)  # headers + first enhanced chunks
        assert b"200" in early.split(b"\r\n", 1)[0]
        # poll until PCM payload shows up beyond the header block
        deadline = time.time() + 60
        body = early.split(b"\r\n\r\n", 1)[1] if b"\r\n\r\n" in early else b""
        while len(body) < 1024 and time.time() < deadline:
            try:
                more = s.recv(65536)
            except socket.timeout:
                break
            if not more:
                break
            body += more
        assert len(body) >= 1024, (
            "no enhanced audio arrived before the request body finished"
        )
        # finish the request; the server must flush the tail and close
        tail = raw[4 * quarter:]
        if tail:
            s.sendall(f"{len(tail):x}\r\n".encode() + tail + b"\r\n")
        s.sendall(b"0\r\n\r\n")
        while True:
            more = s.recv(65536)
            if not more:
                break
    finally:
        s.close()


def test_stream_rejected_for_bidirectional_head(tmp_path):
    """A bidirectional checkpoint still serves /enhance; /stream answers
    400 with the reason."""
    _make_ckpt(tmp_path, bidirectional=True)
    server = _start_server(tmp_path)
    try:
        host, port = server.server_address
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("POST", "/stream", body=b"\x00" * 64,
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 400
        assert b"unidirectional" in body
        conn.close()
    finally:
        server.shutdown()
