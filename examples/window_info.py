"""Example: window metadata and numeric analysis (wininfo in code).

Static metadata (`window/metadata.go:5`) vs DFT-measured figures
(`window/analyze.go:24-120`) for classic windows — the same tables the
`wininfo` CLI prints (`python -m algodsp_tpu.tools.wininfo -all`).

Run: python examples/window_info.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from algodsp_tpu.window import WindowType, info, analyze, generate


def main():
    print(f"{'window':22s} {'ENBW':>6s} {'sidelobe':>9s} {'3dB BW':>7s} "
          f"{'scallop':>8s}")
    for wt in (WindowType.HANN, WindowType.HAMMING,
               WindowType.BLACKMAN_HARRIS_4TERM, WindowType.FLAT_TOP):
        meta = info(wt)
        a = analyze(generate(wt, 4096))
        print(f"{wt.value:22s} {meta.enbw:6.3f} "
              f"{a.highest_sidelobe_db:9.1f} {a.bandwidth_3db:7.2f} "
              f"{a.scallop_loss_db:8.2f}")
    # a Hann window's ENBW is exactly 1.5 bins
    print("hann ENBW:", round(info(WindowType.HANN).enbw, 3))


if __name__ == "__main__":
    main()

# Output:
# hann ENBW: 1.5
