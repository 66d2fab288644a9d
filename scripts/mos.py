"""Minimal MOS (mean-opinion-score) human-eval server (counterpart of the
reference's `scripts/mos.py` flask app): serves pairs of samples from XP
sample folders and records 1-5 ratings to a JSONL file.

Requires `flask` (not bundled in every image).

    python scripts/mos.py /path/to/xps/<sig>/samples --port 5000
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import json
import time

try:
    from flask import Flask, jsonify, request, send_file
except ImportError as e:  # pragma: no cover
    raise SystemExit("flask is not installed in this image; MOS evaluation "
                     "needs a host with flask available") from e


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("samples_dir")
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--ratings", default="mos_ratings.jsonl")
    args = parser.parse_args()

    samples = sorted(Path(args.samples_dir).rglob("*.wav"))
    assert samples, f"no samples under {args.samples_dir}"
    app = Flask("mos")
    state = {"idx": 0}

    @app.get("/")
    def index():
        return (f"<html><body><h3>MOS eval: {len(samples)} samples</h3>"
                f"<audio controls src='/sample'></audio>"
                + "".join(f"<button onclick=\"fetch('/rate?score={s}',"
                          f"{{method:'POST'}}).then(()=>location.reload())\">"
                          f"{s}</button>" for s in range(1, 6))
                + "</body></html>")

    @app.get("/sample")
    def sample():
        return send_file(samples[state["idx"] % len(samples)])

    @app.post("/rate")
    def rate():
        entry = {"path": str(samples[state["idx"] % len(samples)]),
                 "score": int(request.args["score"]), "time": time.time()}
        with open(args.ratings, "a") as f:
            f.write(json.dumps(entry) + "\n")
        state["idx"] += 1
        return jsonify(entry)

    app.run(port=args.port)


if __name__ == "__main__":
    main()
