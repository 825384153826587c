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


def test_transport_and_running_config(server):
    """Transport + run/stop over /config (`sequencer.go:39-61`)."""
    _post(server, "/config", json.dumps(
        {"bpm": 120, "shuffle": 0.5, "decay_s": 0.3, "running": True}))
    st = json.load(urllib.request.urlopen(_url(server, "/state")))
    assert st["shuffle"] == 0.5 and st["decay_s"] == 0.3
    assert st["running"] is True and 0 <= st["current_step"] < 16
    # stop: rendered audio decays to (near) silence once voices die out
    _post(server, "/config", json.dumps({"running": False}))
    urllib.request.urlopen(_url(server, "/render?n=131072")).read()
    data = urllib.request.urlopen(_url(server, "/render?n=8192")).read()
    a = np.frombuffer(data, np.float32)
    assert float(np.abs(a).max()) < 1e-3
    _post(server, "/config", json.dumps(
        {"running": True, "shuffle": 0.0, "decay_s": 0.25}))


def test_step_dict_form_and_node_curves(server):
    """Dict-form steps + per-node curve endpoints
    (`engine.go:623-672`)."""
    steps = [{"enabled": i % 4 == 0, "freq": 220.0 * (1 + i % 4)}
             for i in range(16)]
    _post(server, "/steps", json.dumps(steps))
    st = json.load(urllib.request.urlopen(_url(server, "/state")))
    assert st["steps"][0] == {"enabled": True, "freq": 220.0}
    assert st["steps"][1]["enabled"] is False
    graph = {"nodes": [
        {"id": "comp", "type": "dyn-compressor",
         "params": {"thresholdDB": -20.0, "ratio": 4.0, "kneeDB": 0.0,
                    "makeupGainDB": 0.0}},
        {"id": "hp", "type": "filter-highpass", "params": {"freq": 200.0}}],
        "connections": [{"from": "_input", "to": "comp"},
                        {"from": "comp", "to": "hp"},
                        {"from": "hp", "to": "_output"}]}
    _post(server, "/graph", json.dumps(graph))
    resp = json.load(urllib.request.urlopen(
        _url(server, "/node_curve?id=hp&freqs=20,2000")))
    assert resp["db"][0] < -20.0 and abs(resp["db"][1]) < 1.0
    dyn = json.load(urllib.request.urlopen(
        _url(server, "/dyn_curve?id=comp&min=-40&max=0&points=3")))
    assert dyn["in_db"] == [-40.0, -20.0, 0.0]
    assert dyn["out_db"][0] == pytest.approx(-40.0, abs=0.2)
    assert dyn["out_db"][2] == pytest.approx(-15.0, abs=0.5)
    # unknown node id -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(server, "/dyn_curve?id=nope"))
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(server, "/node_curve?id=comp&freqs=100"))
    assert ei.value.code == 400


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


def test_fallback_ring_wraparound():
    """The pure-Python ring (used when the native lib isn't built) is
    circular over one preallocated buffer: interleaved write/read
    sequences crossing the wrap point preserve FIFO order and never
    overrun capacity."""
    from algodsp_tpu.demo.serve import _FallbackRing
    ring = _FallbackRing(8)
    src = np.arange(100, dtype=np.float32)
    got = []
    w = 0
    while len(got) < 100:
        w += ring.write(src[w:w + 5])
        out = np.empty(3, np.float32)
        n = ring.read_into(out)
        got.extend(out[:n].tolist())
        assert ring.readable + ring.writable == 8
    np.testing.assert_array_equal(np.asarray(got[:100]), src)
    # write beyond capacity truncates (SPSC contract)
    ring2 = _FallbackRing(4)
    assert ring2.write(src[:10]) == 4
    out = np.empty(10, np.float32)
    assert ring2.read_into(out) == 4
    np.testing.assert_array_equal(out[:4], src[:4])


def test_waveform_meters_and_ir_data_endpoints(server):
    """Round-5 UI depth endpoints: oscilloscope buckets, master-bus
    meters, IR-browser envelopes."""
    # render something so the bus tail is non-trivial
    urllib.request.urlopen(_url(server, "/render?n=8192")).read()
    wf = json.load(urllib.request.urlopen(
        _url(server, "/waveform?points=128")))
    assert len(wf["min"]) == 128 and len(wf["max"]) == 128
    assert all(a <= b for a, b in zip(wf["min"], wf["max"]))
    st = json.load(urllib.request.urlopen(_url(server, "/state")))
    assert {"peak_db", "rms_db"} <= set(st["meters"])
    assert st["meters"]["peak_db"] >= st["meters"]["rms_db"]
    irs = json.load(urllib.request.urlopen(_url(server, "/irs")))
    d = json.load(urllib.request.urlopen(
        _url(server, "/ir_data?name=" + irs[0]["name"])))
    assert d["name"] == irs[0]["name"]
    assert len(d["env_db"]) == 256 and d["seconds"] > 0
    from urllib.error import HTTPError
    with pytest.raises(HTTPError):
        urllib.request.urlopen(_url(server, "/ir_data?name=nope"))
