"""Round 2 of the scan-over-layers 30s-MFU sweep: dots remat with the
pallas-output-saving policy (o AND lse kept — backward runs only the
kernel's bwd pass, never its fwd). See bench_scan_train.py for round 1:
scan_torch_xla_tb16 0.239 (parity with unrolled), scan_dots_flash_tb8
0.155 (kernel re-run: only the tagged output o was saved, lse was not),
none/dots-xla/tb16 configs crash the remote-compile helper (the buffer
plans exceed the 16 GB chip).

Run on the TPU chip:  python scripts/bench_scan_train2.py
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = ["bench"]

import bench  # noqa: E402


CONFIGS = [
    ("scan_dots_flash_tb8_v2", 8, "dots", True, "auto"),
    ("scan_dots_flash_tb12_v2", 12, "dots", True, "auto"),
]


def main():
    results = {}
    for tag, tb, ckpt, scan, backend in CONFIGS:
        try:
            tput, mfu = bench.bench_train(TB=tb, duration=30.0,
                                          checkpointing=ckpt,
                                          layer_scan=scan,
                                          attn_backend=backend)
            results[tag] = {"audio_sec_per_sec": tput, "mfu": mfu}
        except Exception as e:
            results[tag] = {"error": f"{type(e).__name__}: {e}"[:300]}
            traceback.print_exc()
        print(json.dumps({tag: results[tag]}), flush=True)
    print(json.dumps({"scan_train30_v2": results}), flush=True)


if __name__ == "__main__":
    main()
