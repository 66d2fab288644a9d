"""Round 3 of the 30s-MFU sweep: checkpointing='dots_nb'
(dots_with_no_batch_dims_saveable) — save every projection/FFN matmul
output but NOT the batched attention dots, so backward recomputes only the
attention chain (logits+softmax+PV, ~20% of a forward) and the [B,H,T,T]
logits exist only as a backward-pass temporary. Pure XLA: no Pallas kernel,
so no custom-VJP/compile-helper exposure.

Round-1/2 context (bench_scan_train*.py): 'torch' full remat + xla = 0.239
(the production number), every flash-under-remat config loses or fails to
compile on this image.

Run on the TPU chip:  python scripts/bench_scan_train3.py
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = ["bench"]

import bench  # noqa: E402


CONFIGS = [
    ("scan_dotsnb_xla_tb8", 8, "dots_nb", True, "xla"),
    ("scan_dotsnb_xla_tb12", 12, "dots_nb", True, "xla"),
    ("scan_dotsnb_xla_tb16", 16, "dots_nb", True, "xla"),
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
    print(json.dumps({"scan_train30_v3": results}), flush=True)


if __name__ == "__main__":
    main()
