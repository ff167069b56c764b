"""Additional interleaved strong-scaling pairs via run_scaling.run_level
(same pinned methodology); prints one JSON line per pair. Merge into
BENCH/BASELINE.md per-pair table by hand. Usage:
python tools/extra_pairs.py [n_pairs] [rows]"""
import importlib.util
import json
import sys

sys.path.insert(0, ".")
n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
sys.argv = ["run_scaling.py", sys.argv[2] if len(sys.argv) > 2 else "150000"]
spec = importlib.util.spec_from_file_location("rs", "tools/run_scaling.py")
rs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rs)
for i in range(n):
    # 4N first: lulls on this host last minutes, and the short run is
    # the one a closing lull corrupts most — let it sample the window
    # closest to launch
    hi = rs.run_level(8)
    lo = rs.run_level(2)
    print(json.dumps({"pair": i, "lo": lo, "hi": hi,
                      "eff": round((lo["total"] / hi["total"]) / 4, 3)}),
          flush=True)
