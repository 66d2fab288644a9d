"""30s-shape train-MFU exploration: scan-over-layers x attention backend x
remat policy (VERDICT r4 next-round #2, continuing the measured story in
README "30s-shape training MFU").

Why scan-over-layers changes the game at T=1500: the unrolled 24-layer
training program with the flash custom-VJP kernel crashes this image's
remote-compile helper (HTTP 500) before memory even matters — with
`layer_scan=True` (modules/transformer.py) XLA compiles ONE layer body, so
the flash + lighter-remat configs become buildable. The candidate frontier:

  * 'torch' remat + xla     — the r4/r5 production default (0.241 measured)
  * 'dots'  remat + flash   — saves matmul outputs + the tagged flash
    output ('flash_attn_out', DOTS_REMAT_POLICY): backward recomputes only
    elementwise ops, never the kernel; the [B,H,T,T] logits never exist.
  * 'none'        + flash   — no remat at all, if activations fit.

Run on the TPU chip:  python scripts/bench_scan_train.py
Each config runs in this one process (trace-time backend flag is set per
config BEFORE building its step; steps are separate jit programs so there
is no cross-contamination).
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = ["bench"]

import bench  # noqa: E402


CONFIGS = [
    # (tag, TB, checkpointing, layer_scan, attn_backend)
    ("scan_torch_xla_tb16", 16, "torch", True, "xla"),
    ("scan_dots_flash_tb8", 8, "dots", True, "auto"),
    ("scan_dots_flash_tb16", 16, "dots", True, "auto"),
    ("scan_none_flash_tb4", 4, "none", True, "auto"),
    ("scan_none_flash_tb8", 8, "none", True, "auto"),
    ("scan_dots_xla_tb8", 8, "dots", True, "xla"),
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
        except Exception as e:  # OOM / compile failure: record and continue
            results[tag] = {"error": f"{type(e).__name__}: {e}"[:300]}
            traceback.print_exc()
        print(json.dumps({tag: results[tag]}), flush=True)
    print(json.dumps({"scan_train30": results}), flush=True)


if __name__ == "__main__":
    main()
