"""wininfo: print spectral properties of window functions.

Capability parity with `cmd/wininfo/main.go`: a CLI with a name
registry (incl. per-window default alpha), flags -size/-alpha/-all/
-list, printing static metadata and numeric analysis in a table.

Usage:
    python -m algodsp_tpu.tools.wininfo [--size N] [--alpha A] [name ...]
    python -m algodsp_tpu.tools.wininfo --list
    python -m algodsp_tpu.tools.wininfo --all
"""

from __future__ import annotations

import argparse
import math
import sys

from algodsp_tpu import window as win
from algodsp_tpu.window import WindowType

# (cli-name, type, has_alpha, default_alpha) — cmd/wininfo/main.go:30-70
REGISTRY: list[tuple[str, WindowType, bool, float]] = [
    ("rectangular", WindowType.RECTANGULAR, False, 0.0),
    ("hann", WindowType.HANN, False, 0.0),
    ("hamming", WindowType.HAMMING, False, 0.0),
    ("blackman", WindowType.BLACKMAN, False, 0.0),
    ("exact-blackman", WindowType.EXACT_BLACKMAN, False, 0.0),
    ("blackman-harris-3t", WindowType.BLACKMAN_HARRIS_3TERM, False, 0.0),
    ("blackman-harris-4t", WindowType.BLACKMAN_HARRIS_4TERM, False, 0.0),
    ("blackman-nuttall", WindowType.BLACKMAN_NUTTALL, False, 0.0),
    ("nuttall-ctd", WindowType.NUTTALL_CTD, False, 0.0),
    ("nuttall-cfd", WindowType.NUTTALL_CFD, False, 0.0),
    ("flat-top", WindowType.FLAT_TOP, False, 0.0),
    ("kaiser", WindowType.KAISER, True, 8.6),
    ("tukey", WindowType.TUKEY, True, 0.5),
    ("triangle", WindowType.TRIANGLE, False, 0.0),
    ("cosine", WindowType.COSINE, False, 0.0),
    ("welch", WindowType.WELCH, False, 0.0),
    ("lanczos", WindowType.LANCZOS, False, 0.0),
    ("gauss", WindowType.GAUSS, True, 2.5),
    ("lawrey-5t", WindowType.LAWREY_5TERM, False, 0.0),
    ("lawrey-6t", WindowType.LAWREY_6TERM, False, 0.0),
    ("burgess-59db", WindowType.BURGESS_OPTIMIZED_59DB, False, 0.0),
    ("burgess-71db", WindowType.BURGESS_OPTIMIZED_71DB, False, 0.0),
] + [(f"albrecht-{k}t", WindowType[f"ALBRECHT_{k}TERM"], False, 0.0)
     for k in range(2, 12)]

_BY_NAME = {name: (t, has_alpha, da) for name, t, has_alpha, da in REGISTRY}


def _format_row(name: str, size: int, alpha: float | None) -> str:
    t, has_alpha, def_alpha = _BY_NAME[name]
    a = alpha if alpha is not None else (def_alpha if has_alpha else 1.0)
    coeffs = win.generate(t, size, alpha=a)
    analysis = win.analyze(coeffs)
    meta = win.info(t)
    alpha_s = f"{a:g}" if has_alpha else "-"
    return (f"{name:<20} {alpha_s:>6} {analysis.enbw:>8.4f} "
            f"{analysis.highest_sidelobe_db:>10.2f} {analysis.bandwidth_3db:>8.3f} "
            f"{analysis.first_minimum_bins:>9.3f} {analysis.scallop_loss_db:>9.3f} "
            f"{analysis.coherent_gain:>8.4f}"
            + (f"  [{meta.name}]" if meta.name else ""))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="wininfo",
        description="Prints spectral properties of DSP window functions.")
    p.add_argument("names", nargs="*", help="window names (see --list)")
    p.add_argument("--size", type=int, default=1024, help="window length")
    p.add_argument("--alpha", type=float, default=None,
                   help="alpha/beta for parametric windows")
    p.add_argument("--all", action="store_true", help="print all windows")
    p.add_argument("--list", action="store_true", help="list window names")
    if argv is None:
        argv = sys.argv[1:]
    # Go-flag parity (`cmd/wininfo/main.go`): accept single-dash long
    # flags (-size, -alpha, -all, -list) like the reference CLI
    argv = [("-" + a) if a in ("-size", "-alpha", "-all", "-list") else a
            for a in argv]
    args = p.parse_args(argv)

    if args.list:
        for name, *_ in REGISTRY:
            print(name)
        return 0

    names = args.names
    if args.all or not names:
        names = [name for name, *_ in REGISTRY]

    unknown = [n for n in names if n not in _BY_NAME]
    if unknown:
        print(f"unknown window(s): {', '.join(unknown)}", file=sys.stderr)
        print("use --list to see available names", file=sys.stderr)
        return 1

    print(f"{'window':<20} {'alpha':>6} {'ENBW':>8} {'sidelobe':>10} "
          f"{'3dB BW':>8} {'1st null':>9} {'scallop':>9} {'coh.gain':>8}")
    print("-" * 84)
    for name in names:
        print(_format_row(name, args.size, args.alpha))
    return 0


if __name__ == "__main__":
    sys.exit(main())
