"""Example: STFT spectrogram, exact WOLA resynthesis, and MFCCs.

The public STFT stack (beyond the Go reference, which frames signals
privately inside its spectral effects): a chirp's spectrogram ridge
tracks its instantaneous frequency, `istft` reconstructs the signal
exactly, and the two-matmul mel/MFCC path summarizes the frame.

Run: python examples/spectrogram_mfcc.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.spectrum import stft, istft, spectrogram, mfcc


def main():
    sr, n = 48000.0, 1 << 15
    t = np.arange(n) / sr
    # linear chirp 500 Hz -> 8 kHz
    f0, f1 = 500.0, 8000.0
    x = np.sin(2 * np.pi * (f0 * t + (f1 - f0) * t * t / (2 * t[-1])))
    x = x.astype(np.float32)

    frame, hop = 1024, 256
    sg = np.asarray(spectrogram(jnp.asarray(x), frame, hop))
    ridge_hz = sg.argmax(axis=-1) * sr / frame
    k = len(ridge_hz) // 2          # frame centered at t = k*hop/sr
    inst = f0 + (f1 - f0) * (k * hop / sr) / t[-1]
    print(f"chirp ridge at mid-signal: {ridge_hz[k]:.0f} Hz "
          f"(instantaneous {inst:.0f} Hz)")

    y = np.asarray(istft(stft(jnp.asarray(x), frame, hop), hop, length=n))
    print(f"WOLA resynthesis exact: {np.abs(y - x).max() < 1e-4}")

    c = np.asarray(mfcc(jnp.asarray(x), sr, n_mfcc=13, n_mels=40,
                        frame_size=frame, hop_size=hop))
    print(f"mfcc frames x coeffs: {c.shape[0]} x {c.shape[1]}")


if __name__ == "__main__":
    main()
# Output:
# chirp ridge at mid-signal: 4266 Hz (instantaneous 4250 Hz)
# WOLA resynthesis exact: True
# mfcc frames x coeffs: 129 x 13
