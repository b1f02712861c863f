"""Summarize a per-step jsonl training log (tools/train_synthetic.py
--log_jsonl) into the step-time histogram + loss/psnr trajectory STATUS.md
records for hardware runs (VERDICT r4 #2: "a step-time histogram,
monotone loss/PSNR").

Usage: python tools/summarize_run.py docs/runs/train_protocol_r5.jsonl
"""

import json
import sys

import numpy as np


def main(path):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    if not rows:
        print("empty log")
        return
    t = np.array([r["t"] for r in rows])
    loss = np.array([r["loss"] for r in rows])
    psnr = np.array([r["psnr"] for r in rows])
    steps = np.array([r["step"] for r in rows])

    # step 0 carries the compiles; histogram the steady steps
    steady = t[1:] if len(t) > 1 else t
    print(f"steps: {len(rows)} (step {steps[0]}..{steps[-1]})")
    print(f"step 0 (incl. compiles): {t[0]:.1f} s")
    print(f"steady s/step: mean {steady.mean():.2f}  median "
          f"{np.median(steady):.2f}  p5 {np.percentile(steady, 5):.2f}  "
          f"p95 {np.percentile(steady, 95):.2f}  max {steady.max():.2f}")
    edges = np.percentile(steady, [0, 25, 50, 75, 100])
    hist, bins = np.histogram(steady, bins=10)
    print("histogram (steady steps):")
    for c, lo, hi in zip(hist, bins[:-1], bins[1:]):
        bar = "#" * int(round(60 * c / max(hist.max(), 1)))
        print(f"  [{lo:7.2f}, {hi:7.2f}) {c:4d} {bar}")

    def traj(a, name):
        k = max(len(a) // 8, 1)
        pts = [f"{a[i]:.3f}@{steps[i]}" for i in range(0, len(a), k)]
        if (len(a) - 1) % k:
            pts.append(f"{a[-1]:.3f}@{steps[-1]}")
        print(f"{name}: " + " -> ".join(pts))

    traj(loss, "loss")
    traj(psnr, "psnr")
    # windowed means show monotonicity through ray-sampling noise
    w = max(len(loss) // 6, 1)
    lm = [round(float(loss[i:i + w].mean()), 3)
          for i in range(0, len(loss), w)]
    pm = [round(float(psnr[i:i + w].mean()), 3)
          for i in range(0, len(psnr), w)]
    print(f"loss window-means (w={w}): {lm}")
    print(f"psnr window-means (w={w}): {pm}")


if __name__ == "__main__":
    main(sys.argv[1])
