"""Interactive demo server — the L8 browser surface.

The reference ships a wasm web demo whose JS UI pulls audio blocks
through `ScriptProcessorNode(1024).onaudioprocess -> api.render(n)`
(`web/app.js:2009-2017`, `web/wasm/main.go:254-260`). The TPU-native
analog of that JS<->wasm boundary is host<->device dispatch: a producer
thread renders engine blocks (device compute) into the native SPSC
ring buffer (`native/algodsp_native.cpp`), and the browser pulls
decoupled blocks over HTTP — the same render-pull contract with the
ring absorbing dispatch jitter.

Endpoints (stdlib http.server only — no extra deps):
  GET  /            minimal player UI (AudioContext + fetch pull loop)
  GET  /render?n=N  next N mono samples, binary float32 LE
  GET  /state       engine config JSON
  POST /steps       JSON [16 x float | {enabled, freq}] sequencer steps
  POST /eq          JSON [5 x {freq,gain_db,q,family}]
  POST /graph       effect-chain graph JSON (reference format)
  POST /config      JSON {bpm?, waveform?, decay_s?, shuffle?, running?}
  POST /reset
  GET  /node_curve?id=X   per-node EQ magnitude response (dB)
  GET  /dyn_curve?id=X    dynamics-node static transfer curve (dB)
  GET  /waveform?points=N master-bus oscilloscope min/max buckets
  GET  /ir_data?name=X    one library IR's decimated envelope (dB)
  (/state also reports master-bus peak/RMS meters)

Run: `python -m algodsp_tpu.demo.serve [--port 8765]`.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

import numpy as np

from algodsp_tpu.core.pool import Buffer
from algodsp_tpu.demo.engine import Engine, EQBand, Waveform
from algodsp_tpu import native

_BLOCK = 1024          # producer render granularity (app.js:2009 node size)
_RING_BLOCKS = 8       # ring capacity in blocks (~170 ms at 48 kHz)


class _FallbackRing:
    """Pure-Python stand-in when the native library isn't built.

    Circular over one preallocated `core.Buffer` (the reference's
    buffer-reuse discipline, `dsp/buffer/buffer.go:5`): steady-state
    writes and reads allocate nothing."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self._store = Buffer(capacity).samples
        self._head = 0   # next read position
        self._size = 0
        self._lock = threading.Lock()

    @property
    def readable(self) -> int:
        return self._size

    @property
    def writable(self) -> int:
        return self.capacity - self._size

    def write(self, samples) -> int:
        a = np.ascontiguousarray(samples, dtype=np.float32).ravel()
        with self._lock:
            take = min(self.capacity - self._size, a.size)
            pos = (self._head + self._size) % self.capacity
            first = min(take, self.capacity - pos)
            self._store[pos:pos + first] = a[:first]
            self._store[:take - first] = a[first:take]
            self._size += take
            return take

    def read(self, n: int) -> np.ndarray:
        out = np.empty(n, np.float32)
        return out[:self.read_into(out)]

    def read_into(self, out: np.ndarray) -> int:
        with self._lock:
            got = min(self._size, out.size)
            first = min(got, self.capacity - self._head)
            out[:first] = self._store[self._head:self._head + first]
            out[first:got] = self._store[:got - first]
            self._head = (self._head + got) % self.capacity
            self._size -= got
            return got


class DemoServer:
    """Engine + producer thread + HTTP frontend."""

    def __init__(self, sample_rate: float = 48000.0, *, port: int = 8765,
                 host: str = "127.0.0.1"):
        self.engine = Engine(sample_rate)
        # default pattern so `serve` makes sound out of the box
        for i, f in enumerate([220.0, 0, 330.0, 0, 277.2, 0, 330.0, 0,
                               220.0, 0, 330.0, 0, 440.0, 0, 330.0, 0]):
            self.engine.set_step(i, f)
        cap = _BLOCK * _RING_BLOCKS
        self.ring = (native.RingBuffer(cap) if native.available()
                     else _FallbackRing(cap))
        self._engine_lock = threading.Lock()
        # the native ring is single-producer/single-consumer: serialize
        # the two writer call sites (producer thread + pull top-up) and
        # the reader side (ThreadingHTTPServer handlers run concurrently)
        self._write_lock = threading.Lock()
        self._read_lock = threading.Lock()
        self._stop = threading.Event()
        self._producer = threading.Thread(target=self._produce, daemon=True)
        self._httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self.port = self._httpd.server_address[1]

    # -- producer: device renders ahead into the SPSC ring ---------------
    def _produce(self):
        while not self._stop.is_set():
            if not self._render_into_ring():
                self._stop.wait(0.002)

    def _render_into_ring(self) -> bool:
        """Render up to one block and write it without loss. The
        room check happens INSIDE the write lock: writers are
        serialized and concurrent reads only grow the room, so the
        write can never truncate a freshly rendered (stateful) block.
        Returns False when the ring was full."""
        with self._write_lock:
            room = min(self.ring.writable, _BLOCK)
            if room == 0:
                return False
            with self._engine_lock:
                block = self.engine.render(room)
            self.ring.write(block)
            return True

    def pull(self, n: int) -> np.ndarray:
        """The render-pull contract (`web/wasm/main.go:254-260`): return
        exactly n samples, draining the ring and topping up synchronously
        if the producer is behind."""
        out = np.empty(n, np.float32)
        got = 0
        with self._read_lock:
            while got < n and not self._stop.is_set():
                took = self.ring.read_into(out[got:])
                if took:
                    got += took
                else:
                    # ring empty: top up synchronously (loss-free; if
                    # the producer filled it meanwhile this no-ops and
                    # the next read_into drains that data instead)
                    self._render_into_ring()
        return out[:got] if got < n else out

    # -- lifecycle --------------------------------------------------------
    def start(self):
        self._producer.start()
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()

    def stop(self):
        self._stop.set()
        # join the producer before teardown: a daemon thread killed
        # mid-JAX-dispatch at interpreter exit aborts the process
        if self._producer.is_alive():
            self._producer.join(timeout=5.0)
        self._httpd.shutdown()
        self._httpd.server_close()

    # -- HTTP -------------------------------------------------------------
    def state(self) -> dict:
        e = self.engine
        return {
            "sample_rate": e.sample_rate, "bpm": e.bpm,
            "shuffle": e.shuffle, "decay_s": e.voice_decay,
            "running": e.running, "current_step": e.current_step,
            "waveform": e.waveform.name.lower(),
            "steps": [{"enabled": s.enabled, "freq": s.freq_hz}
                      for s in e.steps],
            "eq": [{"freq": b.freq_hz, "gain_db": b.gain_db, "q": b.q,
                    "family": b.family} for b in e.eq_bands],
            "has_chain": e.chain is not None,
            "ring_readable": self.ring.readable,
            "spectrum": dict(e.spectrum.params),
            "meters": e.spectrum.meters(),
        }

    def ir_list(self) -> list:
        """IR library catalog (the webdemo's IRProvider surface,
        `internal/webdemo/irlib.go:13-30`): name + index usable as
        `irName`/`irIndex` params of a `reverb-conv` chain node."""
        from algodsp_tpu.utils.irlib import builtin_irs
        irs = builtin_irs(self.engine.sample_rate)
        return [{"index": i, "name": name,
                 "seconds": len(irs[name][1]) / irs[name][0]}
                for i, name in enumerate(sorted(irs))]

    def ir_data(self, q: dict) -> dict:
        """Decimated envelope of one library IR for the IR-browser
        panel (the reference app's IR plots): max-|.| per bucket in dB,
        plus metadata."""
        from algodsp_tpu.utils.irlib import builtin_irs
        irs = builtin_irs(self.engine.sample_rate)
        name = q.get("name", [""])[0]
        if name not in irs:
            raise ValueError(f"unknown IR {name!r}")
        points = max(2, min(int(q.get("points", ["256"])[0]), 4096))
        sr, ir = irs[name]
        usable = ir.size - (ir.size % points)
        seg = np.abs(ir[:usable].reshape(points, -1)).max(axis=1) \
            if usable >= points else np.abs(ir)[:points]
        db = 20.0 * np.log10(np.maximum(seg.astype(np.float64), 1e-12))
        return {"name": name, "sample_rate": float(sr),
                "seconds": ir.size / float(sr),
                "env_db": [round(float(v), 2) for v in
                           np.maximum(db, -130.0)]}

    def curve(self, path: str, q: dict) -> dict:
        """Analyzer / EQ curve for the canvas (`SpectrumCurveDB`,
        `spectrum.go:63` and the eq-canvas response plot). Frequencies:
        either explicit `?freqs=a,b,c` or `points` log-spaced between
        `fmin`/`fmax`."""
        if "freqs" in q:
            freqs = np.asarray([float(v) for v in q["freqs"][0].split(",")])
        else:
            points = max(2, min(int(q.get("points", ["128"])[0]), 4096))
            fmin = float(q.get("fmin", ["20"])[0])
            fmax = float(q.get("fmax", [str(self.engine.sample_rate / 2)])[0])
            freqs = np.geomspace(max(fmin, 1e-3), max(fmax, fmin + 1), points)
        with self._engine_lock:
            if path == "/spectrum":
                db = self.engine.spectrum.curve_db(freqs)
            elif path == "/node_curve":
                db = self.engine.node_response_db(
                    q.get("id", [""])[0], freqs)
            else:
                db = self.engine.eq_curve_db(freqs)
        db = np.where(np.isfinite(db), db, -130.0)
        return {"freqs": [round(float(f), 3) for f in freqs],
                "db": [round(float(d), 2) for d in db]}

    def dyn_curve(self, q: dict) -> dict:
        """Static transfer curve of a dynamics chain node — the
        compressor/limiter curve canvases (`engine.go:651-672`)."""
        points = max(2, min(int(q.get("points", ["121"])[0]), 4096))
        lo = float(q.get("min", ["-60"])[0])
        hi = float(q.get("max", ["0"])[0])
        inputs = np.linspace(lo, hi, points)
        with self._engine_lock:
            out = self.engine.node_static_curve_db(
                q.get("id", [""])[0], inputs)
        return {"in_db": [round(float(v), 3) for v in inputs],
                "out_db": [round(float(v), 3) for v in out]}

    def _handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    self._send(200, _INDEX_HTML.encode(), "text/html")
                elif url.path == "/render":
                    q = parse_qs(url.query)
                    n = int(q.get("n", [str(_BLOCK)])[0])
                    n = max(1, min(n, 1 << 17))
                    data = server.pull(n)
                    self._send(200, data.tobytes(),
                               "application/octet-stream")
                elif url.path == "/state":
                    self._send(200, json.dumps(server.state()).encode())
                elif url.path == "/waveform":
                    try:
                        q = parse_qs(url.query)
                        points = int(q.get("points", ["256"])[0])
                        with server._engine_lock:
                            wf = server.engine.spectrum.waveform(points)
                    except (ValueError, KeyError) as exc:
                        self._send(400, json.dumps(
                            {"error": str(exc)}).encode())
                        return
                    self._send(200, json.dumps(wf).encode())
                elif url.path == "/ir_data":
                    try:
                        body = server.ir_data(parse_qs(url.query))
                    except (ValueError, KeyError) as exc:
                        self._send(400, json.dumps(
                            {"error": str(exc)}).encode())
                        return
                    self._send(200, json.dumps(body).encode())
                elif url.path == "/irs":
                    self._send(200, json.dumps(server.ir_list()).encode())
                elif url.path in ("/spectrum", "/eq_curve", "/node_curve"):
                    try:
                        self._send(200, json.dumps(server.curve(
                            url.path, parse_qs(url.query))).encode())
                    except (KeyError, ValueError) as exc:
                        self._send(400, json.dumps(
                            {"error": str(exc)}).encode())
                elif url.path == "/dyn_curve":
                    try:
                        self._send(200, json.dumps(server.dyn_curve(
                            parse_qs(url.query))).encode())
                    except (KeyError, ValueError) as exc:
                        self._send(400, json.dumps(
                            {"error": str(exc)}).encode())
                else:
                    self._send(404, b'{"error": "not found"}')

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n).decode() if n else ""
                try:
                    server._apply(urlparse(self.path).path, raw)
                    self._send(200, b'{"ok": true}')
                except Exception as exc:  # surface config errors to UI
                    self._send(400, json.dumps(
                        {"error": str(exc)}).encode())

        return Handler

    def _apply(self, path: str, raw: str):
        with self._engine_lock:
            if path == "/steps":
                steps = json.loads(raw)
                if not isinstance(steps, list) or len(steps) != 16:
                    raise ValueError("steps must be a 16-element list")
                self.engine.set_steps(steps)
            elif path == "/eq":
                bands = json.loads(raw)
                self.engine.set_eq([
                    EQBand(float(b["freq"]), float(b.get("gain_db", 0.0)),
                           q=float(b.get("q", 0.7071)),
                           family=b.get("family", "peak"))
                    for b in bands])
            elif path == "/graph":
                self.engine.load_chain(raw)
            elif path == "/config":
                cfg = json.loads(raw)
                if "bpm" in cfg:
                    bpm = float(cfg["bpm"])
                    if not (20.0 <= bpm <= 400.0):
                        raise ValueError(f"bpm out of range: {bpm}")
                    self.engine.bpm = bpm
                if "waveform" in cfg:
                    self.engine.waveform = Waveform[
                        str(cfg["waveform"]).upper()]
                # transport (`SetTransport`/`SetRunning`,
                # sequencer.go:39-61)
                self.engine.set_transport(
                    decay_s=cfg.get("decay_s"),
                    shuffle=cfg.get("shuffle"))
                if "running" in cfg:
                    self.engine.set_running(bool(cfg["running"]))
            elif path == "/spectrum":
                cfg = json.loads(raw)
                self.engine.spectrum.configure(
                    fft_size=int(cfg.get("fftSize", 2048)),
                    overlap=float(cfg.get("overlap", 0.75)),
                    window=str(cfg.get("window", "blackmanharris")),
                    smoothing=float(cfg.get("smoothing", 0.65)))
            elif path == "/reset":
                self.engine.reset()
            else:
                raise ValueError(f"unknown endpoint {path}")


_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>algodsp-tpu demo</title>
<style>
 body{font-family:system-ui;margin:2rem;max-width:780px}
 button{font-size:1rem;padding:.4rem 1rem;margin-right:.5rem}
 select,input[type=number]{font-size:.95rem}
 textarea{width:100%;height:8rem;font-family:monospace}
 .step{width:3.2rem}
 table{border-collapse:collapse}
 td,th{padding:.15rem .4rem;text-align:left}
 .row{display:flex;gap:1rem;align-items:center;flex-wrap:wrap;margin:.4rem 0}
 canvas{border:1px solid #ccc;width:100%}
</style></head><body>
<h2>algodsp-tpu demo</h2>
<p>16-step sequencer &rarr; 5-band EQ &rarr; effect chain, rendered by
the TPU engine and pulled in 1024-sample blocks (the reference
web demo's render-pull contract).</p>
<div class="row">
<button id="play">play</button><button id="stop">stop</button>
<label>bpm <input id="bpm" type="number" value="120" min="20" max="400"
 style="width:4.5rem"></label>
<label>wave <select id="wave"><option>saw</option><option>square</option>
<option>sine</option><option>triangle</option></select></label>
<label>decay s <input id="decay" type="number" value="0.3" min="0.02"
 max="4" step="0.05" style="width:4.5rem"></label>
<label>shuffle <input id="shuffle" type="number" value="0" min="0" max="0.75"
 step="0.05" style="width:4.5rem"></label>
<label><input id="running" type="checkbox" checked> sequencer run</label>
</div>
<h3>spectrum (blue) &amp; EQ curve (orange) — drag the band handles</h3>
<canvas id="scope" width="740" height="160"></canvas>
<h3>waveform &amp; meters</h3>
<canvas id="wave_cv" width="740" height="90"></canvas>
<div class="row">peak <meter id="m_peak" min="-60" max="0" value="-60"
 style="width:200px"></meter> <span id="m_peak_t"></span>
 &nbsp; rms <meter id="m_rms" min="-60" max="0" value="-60"
 style="width:200px"></meter> <span id="m_rms_t"></span></div>
<h3>steps (Hz, 0 = rest)</h3><div id="steps"></div>
<h3>5-band EQ</h3>
<table id="eq"><tr><th>band</th><th>family</th><th>freq</th><th>gain dB</th>
<th>Q</th></tr></table>
<h3>IR library browser</h3>
<div class="row">IR: <select id="irs"></select>
<button id="irverb">use as conv reverb</button>
<span id="irmeta"></span></div>
<canvas id="ircv" width="740" height="90"></canvas>
<h3>effect chain graph JSON</h3>
<textarea id="graph">{"nodes":[{"id":"verb","type":"reverb-freeverb",
"params":{"roomSize":0.7,"damping":0.4,"wet":0.25,"dry":0.9}}],
"connections":[{"from":"_input","to":"verb"},
{"from":"verb","to":"_output"}]}</textarea><br>
<button id="load">load chain</button> <span id="msg"></span>
<h3>node curves</h3>
<div class="row"><select id="nodesel"></select>
<span id="nodemsg"></span></div>
<canvas id="nodecv" width="740" height="140"></canvas>
<script>
const BLOCK = 4096;
let ctx = null, playing = false, nextT = 0, sr = 48000;
let chainNodes = [];
const $ = id => document.getElementById(id);
async function post(path, body) {
  const r = await fetch(path, {method: 'POST', body: JSON.stringify(body)});
  if (!r.ok) $('msg').textContent = JSON.stringify(await r.json());
  return r.ok;
}
async function getState() {
  const s = await (await fetch('/state')).json();
  sr = s.sample_rate;
  const div = $('steps');
  div.innerHTML = '';
  s.steps.forEach((st, i) => {
    const inp = document.createElement('input');
    inp.className = 'step'; inp.type = 'number';
    inp.value = st.enabled ? st.freq : 0;
    inp.onchange = async () => {
      const steps = [...div.querySelectorAll('input')].map(e => +e.value);
      await post('/steps', steps);
    };
    div.appendChild(inp);
  });
  $('bpm').value = s.bpm;
  $('wave').value = s.waveform;
  $('decay').value = s.decay_s;
  $('shuffle').value = s.shuffle;
  $('running').checked = s.running;
  const eq = $('eq');
  [...eq.querySelectorAll('tr.band')].forEach(r => r.remove());
  s.eq.forEach((b, i) => {
    const tr = document.createElement('tr');
    tr.className = 'band';
    tr.innerHTML = `<td>${i + 1}</td>
<td><select><option>peak</option><option>lowshelf</option>
<option>highshelf</option><option>lowpass</option><option>highpass</option>
</select></td>
<td><input type="number" value="${b.freq}" min="20" max="20000"
 style="width:5.5rem"></td>
<td><input type="number" value="${b.gain_db}" min="-24" max="24" step="0.5"
 style="width:4.5rem"></td>
<td><input type="number" value="${b.q}" min="0.1" max="10" step="0.1"
 style="width:4.5rem"></td>`;
    tr.querySelector('select').value = b.family;
    tr.querySelectorAll('select,input').forEach(el => el.onchange = sendEQ);
    eq.appendChild(tr);
  });
  eqBands = s.eq.map(b => ({freq: b.freq, gain_db: b.gain_db}));
  const irs = await (await fetch('/irs')).json();
  $('irs').innerHTML = irs.map(r =>
    `<option value="${r.name}">${r.name} (${r.seconds.toFixed(2)}s)</option>`
  ).join('');
  drawIR();
}
async function sendEQ() {
  const bands = [...$('eq').querySelectorAll('tr.band')].map(tr => {
    const [fam] = tr.querySelectorAll('select');
    const [f, g, q] = tr.querySelectorAll('input');
    return {family: fam.value, freq: +f.value, gain_db: +g.value, q: +q.value};
  });
  eqBands = bands.map(b => ({freq: b.freq, gain_db: b.gain_db}));
  await post('/eq', bands);
  if (!playing) drawScope();
}
function sendConfig() {
  post('/config', {bpm: +$('bpm').value, waveform: $('wave').value,
                   decay_s: +$('decay').value, shuffle: +$('shuffle').value,
                   running: $('running').checked});
}
['bpm', 'wave', 'decay', 'shuffle', 'running'].forEach(id =>
  $(id).onchange = sendConfig);
async function pump() {
  if (!playing) return;
  // keep ~3 blocks queued ahead of the playhead
  while (nextT < ctx.currentTime + 3 * BLOCK / sr) {
    const buf = await (await fetch('/render?n=' + BLOCK)).arrayBuffer();
    const data = new Float32Array(buf);
    const ab = ctx.createBuffer(1, data.length, sr);
    ab.copyToChannel(data, 0);
    const src = ctx.createBufferSource();
    src.buffer = ab; src.connect(ctx.destination);
    if (nextT < ctx.currentTime) nextT = ctx.currentTime + 0.05;
    src.start(nextT);
    nextT += data.length / sr;
  }
  setTimeout(pump, 250 * BLOCK / sr);
}
function plotInto(cv, d, color, lo, hi) {
  const g = cv.getContext('2d');
  const y = db => cv.height * (1 - (db - lo) / (hi - lo));
  g.strokeStyle = color; g.beginPath();
  d.forEach((v, i) => {
    const px = cv.width * i / (d.length - 1);
    i ? g.lineTo(px, y(v)) : g.moveTo(px, y(v));
  });
  g.stroke();
}
let eqBands = [];       // mirror of the EQ table for canvas handles
const FMIN = 20, NYQ = () => sr / 2;
const fx = (cv, f) => cv.width * Math.log(f / FMIN) / Math.log(NYQ() / FMIN);
const xf = (cv, x) => FMIN * Math.pow(NYQ() / FMIN, x / cv.width);
function drawHandles(cv) {
  const g = cv.getContext('2d');
  eqBands.forEach((b, i) => {
    const x = fx(cv, b.freq);
    const y = cv.height * (1 - (b.gain_db - (-130)) / (24 - (-130)));
    g.fillStyle = i === dragBand ? '#c00' : '#c63';
    g.beginPath(); g.arc(x, y, 6, 0, 7); g.fill();
    g.fillStyle = '#333'; g.font = '10px sans-serif';
    g.fillText(String(i + 1), x - 3, y + 3.5);
  });
}
let dragBand = -1;
function bandAt(cv, ev) {
  const r = cv.getBoundingClientRect();
  const mx = (ev.clientX - r.left) * cv.width / r.width;
  const my = (ev.clientY - r.top) * cv.height / r.height;
  let best = -1, bd = 14;
  eqBands.forEach((b, i) => {
    const x = fx(cv, b.freq);
    const y = cv.height * (1 - (b.gain_db - (-130)) / (24 - (-130)));
    const d = Math.hypot(mx - x, my - y);
    if (d < bd) { bd = d; best = i; }
  });
  return best;
}
function wireScopeDrag() {
  const cv = $('scope');
  cv.onpointerdown = ev => {
    dragBand = bandAt(cv, ev);
    if (dragBand >= 0) cv.setPointerCapture(ev.pointerId);
  };
  cv.onpointermove = ev => {
    if (dragBand < 0) return;
    const r = cv.getBoundingClientRect();
    const mx = (ev.clientX - r.left) * cv.width / r.width;
    const my = (ev.clientY - r.top) * cv.height / r.height;
    const b = eqBands[dragBand];
    b.freq = Math.min(Math.max(Math.round(xf(cv, mx)), 20), NYQ() - 100);
    b.gain_db = Math.round(2 * Math.min(Math.max(
      24 - my / cv.height * (24 - (-130)), -24), 24)) / 2;
    const tr = $('eq').querySelectorAll('tr.band')[dragBand];
    const [f, g2] = tr.querySelectorAll('input');
    f.value = b.freq; g2.value = b.gain_db;
  };
  cv.onpointerup = async ev => {
    if (dragBand < 0) return;
    dragBand = -1;
    await sendEQ();
  };
}
async function drawScope() {
  const cv = $('scope');
  const [spec, eq] = await Promise.all([
    (await fetch('/spectrum?points=256')).json(),
    (await fetch('/eq_curve?points=256')).json()]);
  cv.getContext('2d').clearRect(0, 0, cv.width, cv.height);
  plotInto(cv, spec.db, '#36c', -130, 24);
  plotInto(cv, eq.db, '#c63', -130, 24);
  drawHandles(cv);
  drawWave();
  if (playing) setTimeout(drawScope, 120);
}
async function drawWave() {
  const cv = $('wave_cv');
  const wf = await (await fetch('/waveform?points=370')).json();
  const g = cv.getContext('2d');
  g.clearRect(0, 0, cv.width, cv.height);
  g.fillStyle = '#36c';
  const mid = cv.height / 2, sc = cv.height / 2.2;
  wf.max.forEach((hi, i) => {
    const lo = wf.min[i];
    const x = cv.width * i / wf.max.length;
    g.fillRect(x, mid - hi * sc, cv.width / wf.max.length,
               Math.max((hi - lo) * sc, 1));
  });
  const st = await (await fetch('/state')).json();
  const set = (m, t, v) => {
    $(m).value = Math.max(v, -60); $(t).textContent = v.toFixed(1) + ' dB';
  };
  set('m_peak', 'm_peak_t', st.meters.peak_db);
  set('m_rms', 'm_rms_t', st.meters.rms_db);
}
async function drawIR() {
  const name = $('irs').value;
  if (!name) return;
  const d = await (await fetch('/ir_data?name=' +
                               encodeURIComponent(name))).json();
  $('irmeta').textContent =
    `${d.seconds.toFixed(2)} s @ ${d.sample_rate} Hz`;
  const cv = $('ircv');
  cv.getContext('2d').clearRect(0, 0, cv.width, cv.height);
  plotInto(cv, d.env_db, '#384', -90, 0);
}
async function drawNodeCurve() {
  const id = $('nodesel').value;
  const cv = $('nodecv');
  cv.getContext('2d').clearRect(0, 0, cv.width, cv.height);
  if (!id) return;
  // dynamics nodes expose a static transfer curve, filter-ish nodes a
  // magnitude response; try both endpoints
  let r = await fetch('/dyn_curve?id=' + encodeURIComponent(id));
  if (r.ok) {
    const d = await r.json();
    plotInto(cv, d.out_db, '#384', -60, 0);
    $('nodemsg').textContent = 'static transfer (in -60..0 dB)';
    return;
  }
  r = await fetch('/node_curve?id=' + encodeURIComponent(id) + '&points=256');
  if (r.ok) {
    const d = await r.json();
    plotInto(cv, d.db, '#836', -60, 24);
    $('nodemsg').textContent = 'magnitude response (20 Hz..Nyquist)';
  } else $('nodemsg').textContent = 'no curve for this node type';
}
$('nodesel').onchange = drawNodeCurve;
$('irs').onchange = drawIR;
wireScopeDrag();
$('play').onclick = async () => {
  if (!ctx) ctx = new AudioContext({sampleRate: sr});
  await ctx.resume(); playing = true; nextT = 0; pump(); drawScope();
};
$('stop').onclick = () => { playing = false; };
$('irverb').onclick = () => {
  $('graph').value = JSON.stringify({
    nodes: [{id: 'verb', type: 'reverb-conv',
             params: {irName: $('irs').value, wet: 0.35, dry: 1.0}}],
    connections: [{from: '_input', to: 'verb'},
                  {from: 'verb', to: '_output'}]}, null, 1);
};
$('load').onclick = async () => {
  const ok = await post('/graph', JSON.parse($('graph').value));
  $('msg').textContent = ok ? 'chain loaded' : $('msg').textContent;
  if (ok) {
    chainNodes = JSON.parse($('graph').value).nodes.map(n => n.id);
    $('nodesel').innerHTML = '<option value="">(select node)</option>' +
      chainNodes.map(n => `<option>${n}</option>`).join('');
  }
};
getState();
</script></body></html>
"""


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="algodsp-tpu demo server")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args(argv)
    srv = DemoServer(port=args.port, host=args.host)
    srv.start()
    print(f"demo server on http://{args.host}:{srv.port}/ "
          f"(ring: {'native SPSC' if native.available() else 'fallback'})")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
