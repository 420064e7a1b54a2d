#!/usr/bin/env python3
"""Generate the q51 cross-engine WAV fixture (dev tool, r17).

CPython's stdlib `wave` module WRITES the containers (an independent
RIFF/WAVE producer — the byte layout our parser must accept was authored
by CPython, not this repo), and the expected features are computed here
over the same PCM with numpy for the standard signals (rms =
sqrt(mean((pcm/32768)^2))) plus restatements of the house definitions
(nonzero-sign zero-cross, 64-window energy-contour afp). Deterministic:
PCM comes from fixed integer formulas, no randomness.

Output: src/test/resources/graft/q51_wav_expected/ — one .wav per case +
expected.json with (name, sample_rate, channels, duration_ms, rms,
zero_cross, afp).
"""
import json
import math
import pathlib
import struct
import wave

def pcm_cases():
    cases = {}
    # pure 440 Hz sine, 8 kHz, 200 ms, mono — the classic
    n = 1600
    cases["sine_8k_mono"] = (8000, 1, [
        int(12000 * math.sin(2 * math.pi * 440 * i / 8000)) for i in range(n)])
    # stereo: L = ramp saw, R = alternating block wave, 16 kHz, 100 ms
    n = 1600
    left = [((i * 37) % 20000) - 10000 for i in range(n)]
    right = [8000 if (i // 50) % 2 == 0 else -8000 for i in range(n)]
    cases["saw_block_16k_stereo"] = (16000, 2, list(zip(left, right)))
    # silence with a single click (zero-cross edge rules)
    n = 512
    click = [0] * n
    click[100] = 5000
    click[101] = -5000
    cases["click_8k_mono"] = (8000, 1, click)
    # short clip below 64 samples -> afp must be 0
    cases["short_8k_mono"] = (8000, 1, [1000, -1000, 1000, -1000] * 8)
    return cases

def mono_mix(rate, ch, data):
    if ch == 1:
        return [s / 32768.0 for s in data]
    return [(l / 32768.0 + r / 32768.0) / 2 for (l, r) in data]

def features(rate, ch, data):
    import numpy as np
    s = np.array(mono_mix(rate, ch, data), dtype=np.float64)
    rms = float(np.sqrt(np.mean(s * s))) if len(s) else 0.0
    # house zero-cross: sign of last NONZERO sample
    zc, last = 0, 0
    for v in s:
        sign = (1 if v > 0 else 0) - (1 if v < 0 else 0)
        if sign != 0:
            if last != 0 and sign != last:
                zc += 1
            last = sign
    # house afp: 64 equal windows of squared energy
    if len(s) < 64:
        afp = 0
    else:
        win = len(s) // 64
        e = [float(np.sum(s[i*win:(i+1)*win] ** 2)) for i in range(64)]
        mean = sum(e) / 64.0
        afp = 1 if e[0] > mean else 0
        for i in range(1, 64):
            if e[i] > e[i-1]:
                afp |= 1 << i
    dur = round(1000.0 * len(s) / rate) if rate else 0
    return rms, zc, afp, dur

dest = pathlib.Path(__file__).resolve().parents[2] / \
    "src/test/resources/graft/q51_wav_expected"
dest.mkdir(parents=True, exist_ok=True)
rows = []
for name, (rate, ch, data) in pcm_cases().items():
    path = dest / f"{name}.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        if ch == 1:
            frames = b"".join(struct.pack("<h", s) for s in data)
        else:
            frames = b"".join(struct.pack("<hh", l, r) for (l, r) in data)
        w.writeframes(frames)
    rms, zc, afp, dur = features(rate, ch, data)
    # two's-complement: the JVM side is a SIGNED 64-bit long, and a JSON
    # number above 2^63 would be read back through a lossy double
    afp_signed = afp - (1 << 64) if afp >= (1 << 63) else afp
    rows.append({"name": name, "sample_rate": rate, "channels": ch,
                 "duration_ms": dur, "rms": rms, "zero_cross": zc,
                 "afp": afp_signed})
(dest / "expected.json").write_text(json.dumps(rows, indent=1))
print(f"wrote {dest} ({len(rows)} cases)")
for r in rows:
    print(" ", r)
