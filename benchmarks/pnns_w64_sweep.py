"""PNNS w64 batch sweep on TPU (driver: bench.bench_pnns_w64)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["BENCH_DEADLINE_SECS"] = "86400"
import bench

for B in (8, 16, 32):
    qps = bench.bench_pnns_w64(batch=B)
    print(f"w64 PNNS batch={B}: {qps:.2f} q/s", flush=True)
