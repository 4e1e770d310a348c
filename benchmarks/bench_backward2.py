#!/usr/bin/env python
"""Follow-up: capacity_slack 1.25 x compute dtype on the headline
(bench_backward.py found slim_k alone = +19%)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_backward import bench  # noqa: E402
import jax  # noqa: E402

print(f"devices: {jax.devices()}", flush=True)
bench("bf16_slim", slack=1.25)
bench("mixed_slim", dtype="mixed", slack=1.25)
bench("f32_slim", dtype="float32", slack=1.25)
bench("bf16_s115", slack=1.15)
