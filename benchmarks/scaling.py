"""Scaling-efficiency harness (SURVEY.md §7 M5).

Measures the channel-sharded pipeline at 1..N devices and reports
scaling efficiency. On this container only one real TPU chip is
attached, so device counts > 1 run on the virtual CPU mesh
(`--backend cpu --devices 8`) — the same code path a pod executes, with
XLA collectives over the host "interconnect". The time-sharded biquad
is also validated for exactness at each width.

Usage:
    python benchmarks/scaling.py --backend cpu --devices 8
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--samples", type=int, default=1 << 17)
    args = ap.parse_args()

    if args.backend == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.devices}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from algodsp_tpu.parallel import make_mesh, biquad_time_sharded
    from algodsp_tpu.filters import BiquadChain, design

    chain = BiquadChain(design.butterworth_lp(2000.0, 10, 48000.0))
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((args.channels, args.samples)).astype(np.float32)

    def bench(fn, x, reps=3):
        y = fn(x)
        float(y.ravel()[-1])
        t0 = time.time()
        for _ in range(reps):
            y = fn(x)
        float(y.ravel()[-1])
        return (time.time() - t0) / reps

    results = []
    n_dev = len(jax.devices())
    widths = [w for w in (1, 2, 4, 8, 16) if w <= n_dev]
    for w in widths:
        mesh = make_mesh({"channel": w}, devices=jax.devices()[:w])
        xs = jax.device_put(jnp.asarray(x_np),
                            NamedSharding(mesh, P("channel", None)))
        f = jax.jit(chain.process)
        t = bench(f, xs)
        results.append((w, t))
        print(f"channel-sharded over {w} device(s): {t*1e3:8.2f} ms  "
              f"{args.channels*args.samples/t/1e6:8.1f} Msamples/s",
              file=sys.stderr)

    t1 = results[0][1]
    if args.backend == "cpu":
        print("\nNOTE: virtual CPU devices share the same physical cores, so "
              "efficiency numbers here do NOT project to a pod (a single "
              "XLA-CPU device already multithreads). This harness validates "
              "that the identical sharded program compiles, runs, and stays "
              "exact at every mesh width; run with --backend tpu on a real "
              "slice for meaningful efficiency.")
    print("\n| Devices | ms | Msamples/s | Scaling efficiency |")
    print("|---:|---:|---:|---:|")
    for w, t in results:
        eff = 100.0 * t1 / (t * w)
        print(f"| {w} | {t*1e3:.2f} | {args.channels*args.samples/t/1e6:.1f} "
              f"| {eff:.0f}% |")

    # exactness of the time-sharded biquad at the widest mesh
    if n_dev >= 4:
        mesh = make_mesh({"channel": 2, "time": min(4, n_dev // 2)})
        small = jnp.asarray(x_np[:4, :8192])
        y_sh = np.asarray(biquad_time_sharded(small, chain, mesh))
        y_ref = np.asarray(chain.process(small))
        err = y_ref - y_sh
        snr = 10 * np.log10((y_ref.astype(np.float64) ** 2).sum()
                            / max((err.astype(np.float64) ** 2).sum(), 1e-30))
        print(f"\ntime-sharded biquad exactness (channel=2 x time mesh): "
              f"{snr:.0f} dB SNR vs single-device")


if __name__ == "__main__":
    main()
