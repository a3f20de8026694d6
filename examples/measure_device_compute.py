"""Measure TRUE per-phase device execution time (methodology of
BENCHMARKS.md "True device execution vs wall attribution").

Usage:  python examples/measure_device_compute.py   # on the TPU env

Why this exists: through a remote/tunneled chip, per-phase wall clocks
mostly measure dispatch round trips and enqueue overhead, not TPU
execution. Each phase is timed by enqueuing REPS calls with FRESH
on-device random inputs (no host transfers inside the timed region, no
identical-input replay) and blocking once at the end — the amortized
per-call time is the device execution time.

MUST run in a fresh process BEFORE any bulk transfer: after a big
download the relay command stream throttles for the process lifetime and
inflates even enqueue-only micro-timings ~50x (measured; CLAUDE.md).
The implementation lives in bench.py (measure_device_compute), which
runs it first for exactly that reason — this script is the standalone
entry point.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


def main():
    from bench import measure_device_compute
    from stabstitch2_tpu.pipeline.stitcher import init_stitcher

    frames = int(os.environ.get("BENCH_FRAMES", "48"))
    chunk = int(os.environ.get("BENCH_CHUNK", "8"))
    st = init_stitcher(rng_seed=0, chunk=chunk)
    dev = measure_device_compute(st, frames=frames, chunk=chunk)
    print(json.dumps(dev, indent=2))
    print(f"= {dev['fps_equiv']:,.0f} fps/chip equivalent "
          f"({dev['total_ms']} ms / {frames} frames @ 360x480)")


if __name__ == "__main__":
    main()
