"""Canvas-vs-map batched A/B through bench.py's own pipelined measurement
pattern (VERDICT r3 #4): device-staged frames, exactness-flag fetch
overlapped, best-of-N spaced attempts, health-probed.

Round 3's script numbers (481/537 ms/frame) were tunnel-I/O artifacts; this
uses bench.bench_batched itself so both modes are measured exactly the way
the official record is.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: F401
import bench


def main():
    H, W, K = 720, 1280, 1600
    reps = int(os.environ.get("FSTPU_BENCH_REPS", "10"))
    results = {}
    for B in (16, 32):
        for mode in ("map", "canvas"):
            os.environ["FSTPU_BENCH_MODE"] = mode
            h = bench.wait_healthy(f"ab_{mode}_B{B}")
            print(f"health: {h}", flush=True)
            try:
                val, info = bench.best_of(
                    lambda: bench.bench_batched(B, H, W, K, 10, 3, "pallas",
                                                reps),
                    n=3, pick=max)
                ms_frame = (H * W) / val / 1e3
                results[(mode, B)] = val
                print(f"mode={mode:6s} B={B:2d}: {val:7.2f} Mpix/s "
                      f"({ms_frame:6.2f} ms/frame) attempts={info['attempts']}",
                      flush=True)
            except Exception as e:
                print(f"mode={mode:6s} B={B:2d}: FAILED {str(e)[:300]}",
                      flush=True)
    if results:
        best = max(results, key=results.get)
        print(f"WINNER: mode={best[0]} B={best[1]} "
              f"({results[best]:.2f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
