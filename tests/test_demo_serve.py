"""Demo server tests (L8 surface; render-pull contract of
`web/wasm/main.go:254-260` over HTTP)."""

import json
import urllib.request

import numpy as np
import pytest

from algodsp_tpu.demo.serve import DemoServer


@pytest.fixture(scope="module")
def server():
    srv = DemoServer(port=0)
    srv.start()
    yield srv
    srv.stop()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.port}{path}"


def _post(srv, path, body: str):
    req = urllib.request.Request(_url(srv, path), data=body.encode(),
                                 method="POST")
    return urllib.request.urlopen(req)


def test_render_pull_returns_audio(server):
    data = urllib.request.urlopen(_url(server, "/render?n=4096")).read()
    a = np.frombuffer(data, np.float32)
    assert a.shape == (4096,)
    assert np.all(np.isfinite(a))
    assert float(np.sqrt(np.mean(a ** 2))) > 1e-4  # default pattern sounds


def test_state_and_config(server):
    st = json.load(urllib.request.urlopen(_url(server, "/state")))
    assert st["sample_rate"] == 48000.0
    assert len(st["steps"]) == 16 and len(st["eq"]) == 5
    _post(server, "/config", json.dumps({"bpm": 140}))
    st2 = json.load(urllib.request.urlopen(_url(server, "/state")))
    assert st2["bpm"] == 140.0


def test_steps_and_graph_edit(server):
    _post(server, "/steps", json.dumps([330.0] + [0.0] * 15))
    graph = {"nodes": [{"id": "v", "type": "reverb-freeverb",
                        "params": {"roomSize": 0.7, "wet": 0.3,
                                   "dry": 0.7}}],
             "connections": [{"from": "_input", "to": "v"},
                             {"from": "v", "to": "_output"}]}
    _post(server, "/graph", json.dumps(graph))
    st = json.load(urllib.request.urlopen(_url(server, "/state")))
    assert st["has_chain"] is True
    data = urllib.request.urlopen(_url(server, "/render?n=2048")).read()
    a = np.frombuffer(data, np.float32)
    assert a.shape == (2048,) and np.all(np.isfinite(a))


def test_invalid_posts_return_400(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/steps", "[1, 2]")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/config", json.dumps({"bpm": 9999}))
    assert ei.value.code == 400


def test_index_page(server):
    html = urllib.request.urlopen(_url(server, "/")).read().decode()
    assert "render" in html and "sequencer" in html.lower()


def test_ir_catalog_and_conv_reverb_by_name(server):
    irs = json.load(urllib.request.urlopen(_url(server, "/irs")))
    assert len(irs) >= 5 and {"index", "name", "seconds"} <= set(irs[0])
    names = [e["name"] for e in irs]
    assert "small-room" in names
    graph = {"nodes": [{"id": "cv", "type": "reverb-conv",
                        "params": {"irName": "small-room", "wet": 0.4}}],
             "connections": [{"from": "_input", "to": "cv"},
                             {"from": "cv", "to": "_output"}]}
    _post(server, "/graph", json.dumps(graph))
    data = urllib.request.urlopen(_url(server, "/render?n=2048")).read()
    a = np.frombuffer(data, np.float32)
    assert a.shape == (2048,) and np.all(np.isfinite(a))


def test_spectrum_and_eq_curve_endpoints(server):
    # prime the analyzer by pulling some audio
    urllib.request.urlopen(_url(server, "/render?n=8192")).read()
    spec = json.load(urllib.request.urlopen(_url(server, "/spectrum?points=64")))
    assert len(spec["freqs"]) == 64 and len(spec["db"]) == 64
    assert all(-130.0 <= d <= 24.0 for d in spec["db"])
    eq = json.load(urllib.request.urlopen(
        _url(server, "/eq_curve?freqs=100,1000,10000")))
    assert eq["freqs"] == [100.0, 1000.0, 10000.0]
    assert all(abs(d) < 1.0 for d in eq["db"])  # default EQ flat
    # reconfigure the analyzer (POST /spectrum) with reference params
    _post(server, "/spectrum", json.dumps(
        {"fftSize": 1024, "window": "hann", "overlap": 0.5, "smoothing": 0.3}))
    st = json.load(urllib.request.urlopen(_url(server, "/state")))
    assert st["spectrum"] == {"fft_size": 1024, "overlap": 0.5,
                              "window": "hann", "smoothing": 0.3}
    spec2 = json.load(urllib.request.urlopen(
        _url(server, "/spectrum?points=16")))
    assert all(-130.0 <= d <= 24.0 for d in spec2["db"])
