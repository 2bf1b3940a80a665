"""Benchmark: multi-scale Haar face detection throughput on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): ≥5000 1080p frames/sec/chip with
detection parity vs the reference XML.
"""

import json
import os
import sys
import time

import numpy as np


def synth_frame(k=0, h=1080, w=1920):
    rng = np.random.default_rng(3 + k)
    img = np.full((h, w), 128, np.uint8)
    try:
        import cv2

        for _ in range(40):
            cx, cy = int(rng.integers(80, w - 80)), int(rng.integers(80, h - 80))
            s = int(rng.integers(25, 120))
            cv2.ellipse(img, (cx, cy), (s, int(s * 1.25)), 0, 0, 360,
                        int(rng.integers(180, 230)), -1)
            for ex in (-1, 1):
                cv2.circle(img, (cx + ex * s // 3, cy - s // 4),
                           max(2, s // 8), int(rng.integers(30, 80)), -1)
        img = cv2.GaussianBlur(img, (5, 5), 1.5)
    except Exception:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    noise = rng.integers(-8, 8, img.shape).astype(np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def main():
    from cascadeclassifier_tpu.detect.detector import TPUDetector
    from cascadeclassifier_tpu.models.xml_io import read_cascade_xml

    xml = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_alt.xml"
    model = read_cascade_xml(xml)
    det = TPUDetector(model, exact=bool(int(os.environ.get("BENCH_EXACT", "0"))))

    n_frames = int(os.environ.get("BENCH_FRAMES", "32"))
    frames = [synth_frame(k) for k in range(n_frames)]

    # warmup / compile
    det.detect_multi_scale_batch(frames[:1], 1.1, 3)

    t0 = time.time()
    results = det.detect_multi_scale_batch(frames, 1.1, 3)
    dt = time.time() - t0
    total_det = sum(len(r) for r in results)
    fps = n_frames / dt

    baseline = 5000.0
    print(
        json.dumps(
            {
                "metric": "haar_1080p_multiscale_detect",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / baseline, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
